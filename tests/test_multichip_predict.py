"""Data-parallel predict over the virtual 8-device CPU mesh.

(reference capability: multi-GPU Lightning predict with per-rank shards,
deepchopper/cli.py:127-135, deepchopper/models/callbacks.py:25)
"""

from __future__ import annotations

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from deepchopper_tpu.parallel import make_mesh

    return make_mesh(8)


def synth_fq(path, n=64, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "wb") as fh:
        for i in range(n):
            L = int(rng.integers(60, 200))
            seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), L).tobytes()
            fh.write(b"@m_read_%d\n%s\n+\n%s\n" % (i, seq, b"I" * L))
    return path


def test_sharded_predict_matches_single_device(tmp_path, mesh):
    from deepchopper_tpu.data.fastq_module import iter_batches
    from deepchopper_tpu.infer import PredictEngine
    from deepchopper_tpu.models.registry import DeepChopper

    fq = synth_fq(tmp_path / "m.fq")
    bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", seed=0)

    def run(engine):
        out = {}
        batches = iter_batches(fq, max_length=256, tokens_per_batch=4096)
        for batch, labels in engine.predict_batches(batches):
            for i, rid in enumerate(batch.read_ids):
                out[rid] = labels[i, : batch.lengths[i]]
        return out

    single = run(PredictEngine(bundle, max_length=256, tokens_per_batch=4096, return_labels=True))
    sharded = run(
        PredictEngine(
            bundle, max_length=256, tokens_per_batch=4096, return_labels=True, mesh=mesh
        )
    )
    assert set(single) == set(sharded) and len(single) == 64
    for rid in single:
        np.testing.assert_array_equal(single[rid], sharded[rid], err_msg=rid)


def test_sharded_batch_sizes_divide_mesh(mesh):
    from deepchopper_tpu.infer import PredictEngine
    from deepchopper_tpu.models.registry import DeepChopper

    bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", seed=0)
    engine = PredictEngine(bundle, max_length=1024, tokens_per_batch=4096,
                           return_labels=True, mesh=mesh)
    for w in engine.buckets:
        assert engine._bucket_batch_size(w) % 8 == 0


def test_sharded_bucket_covers_producer_full_batches(mesh):
    """The largest compiled row variant must be >= the producer's full-batch
    row count for EVERY bucket width — rounding the mesh multiple down left
    e.g. width 768 at 1<<17 tokens producing 170-row batches with a 168-row
    max variant, which then dispatched unpadded and crashed the sharded jit.
    """
    from deepchopper_tpu.infer import PredictEngine
    from deepchopper_tpu.models.registry import DeepChopper

    bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", seed=0)
    # Default ladder + default tokens_per_batch: the exact shipping config.
    engine = PredictEngine(bundle, return_labels=True, mesh=mesh)
    for w in engine.buckets:
        producer_rows = max(1, min(engine.max_batch, engine.tokens_per_batch // w))
        assert max(engine._row_variants(w)) >= producer_rows, w
        assert engine._bucket_batch_size(w) % 8 == 0


@pytest.mark.slow
def test_flagship_sharded_dispatch_shapes_and_no_allgather(mesh):
    """Flagship-shaped engine on the 8-device mesh: pins the sharded dispatch
    contract for the shipping config.

    * The FULL default bucket ladder's row variants must all divide the mesh
      (asserted without compiling — shapes only).
    * One real dispatch through the flagship model (hyenadna-small-32k
      config) at a real bucket width must (a) keep the labels output
      BATCH-SHARDED across the mesh (no replication of per-read outputs) and
      (b) contain NO all-gather/all-reduce in the compiled HLO — the predict
      path never gathers logits (reference contract: per-rank shards merged
      at chop, deepchopper/models/callbacks.py:25)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from deepchopper_tpu.infer import PredictEngine
    from deepchopper_tpu.models.registry import DeepChopper
    from deepchopper_tpu.parallel.mesh import DATA_AXIS

    bundle = DeepChopper.new("hyenadna-small-32k-seqlen", seed=0)
    # Default ladder + default tokens_per_batch: every compiled variant of
    # every bucket must shard evenly (shapes-only check, no compile).
    shipping = PredictEngine(bundle, return_labels=True, mesh=mesh)
    for w in shipping.buckets:
        for rows in shipping._row_variants(w):
            assert rows % 8 == 0, (w, rows)

    # Real dispatch at a small tokens_per_batch (CPU-mesh affordable) but a
    # real bucket width and the real flagship model.
    engine = PredictEngine(
        bundle, max_length=1024, tokens_per_batch=8192, buckets=[1024],
        return_labels=True, mesh=mesh,
    )
    shape = (8, 1024)
    step = engine._get_step(shape)
    out = step(
        engine._params,
        jnp.zeros(shape, jnp.int8),
        jnp.zeros(shape, jnp.uint8),
    )
    assert out.shape == shape
    sharding = out.sharding
    assert isinstance(sharding, NamedSharding)
    assert sharding.spec and sharding.spec[0] == DATA_AXIS, sharding.spec
    assert not sharding.is_fully_replicated
    # Each device holds exactly its 1/8 batch shard.
    for db in out.addressable_shards:
        assert db.data.shape == (1, 1024)

    hlo = step.lower(
        engine._params,
        jax.ShapeDtypeStruct(shape, jnp.int8),
        jax.ShapeDtypeStruct(shape, jnp.uint8),
    ).compile().as_text()
    for coll in ("all-gather", "all-reduce", "collective-permute", "all-to-all"):
        assert coll not in hlo, f"predict path must not {coll}"


def test_sharded_predict_non_pow2_bucket_dispatch(tmp_path, mesh):
    """End-to-end sharded dispatch through a non-pow2 bucket width whose
    producer row count does not divide the mesh (regression for the
    round-down crash)."""
    from deepchopper_tpu.data.fastq_module import iter_batches
    from deepchopper_tpu.infer import PredictEngine
    from deepchopper_tpu.models.registry import DeepChopper

    rng = np.random.default_rng(7)
    fq = tmp_path / "np2.fq"
    with open(fq, "wb") as fh:
        for i in range(22):  # 22 reads of width-bucket 192: full batch of 21+tail
            L = 150
            seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), L).tobytes()
            fh.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * L))

    bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", seed=0)
    # buckets=[192]: producer target = 4032//192 = 21 rows, not divisible by 8.
    engine = PredictEngine(
        bundle, max_length=192, tokens_per_batch=4032, buckets=[192],
        return_labels=True, mesh=mesh,
    )
    seen = 0
    batches = iter_batches(fq, max_length=192, tokens_per_batch=4032, buckets=[192])
    for batch, labels in engine.predict_batches(batches):
        assert labels.shape[0] == batch.input_ids.shape[0]
        seen += labels.shape[0]
    assert seen == 22
