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
