"""Multi-host data-parallel predict: input sharding, per-rank shards, merge.

The reference's multi-GPU predict relies on Lightning DDP: each rank gets an
interleaved sampler slice, writes `{rank}_{batch}.pt` shards, and the chop
stage merges every shard dir (reference: deepchopper/models/callbacks.py:25,
deepchopper/cli.py:181). Here the same contract is tested two ways:

* in-process: rank-0 and rank-1 predict their `shard=(r, 2)` slices of one
  FASTQ into the same output dir; chop over the merged shards must be
  byte-identical to the unsharded run.
* 2-process: real `jax.distributed` CPU processes (coordinator on localhost)
  prove initialize_distributed + process_index plumbing and a cross-host psum.
"""

from __future__ import annotations

import gzip
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

from deepchopper_tpu.chop import ChopOptions
from deepchopper_tpu.chop.pipeline import run_chop
from deepchopper_tpu.infer import PredictEngine
from deepchopper_tpu.models.registry import DeepChopper

REPO = Path(__file__).resolve().parent.parent


def _write_fastq(path, rng, n=40, min_len=60, max_len=400):
    with open(path, "wb") as fh:
        for i in range(n):
            length = int(rng.integers(min_len, max_len))
            seq = "".join(rng.choice(list("ACGT"), length))
            qual = "".join(chr(c) for c in rng.integers(38, 70, length))
            fh.write(b"@mh_%d\n%s\n+\n%s\n" % (i, seq.encode(), qual.encode()))


def test_sharded_predict_merges_to_identical_chop(tmp_path):
    rng = np.random.default_rng(0)
    fq = tmp_path / "mh.fq"
    _write_fastq(fq, rng)

    bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", seed=0)
    engine = PredictEngine(
        bundle, max_length=512, tokens_per_batch=1 << 12, buckets=[128, 256, 512]
    )

    # Unsharded reference run.
    engine.predict_file(fq, tmp_path / "single", rank=0)
    opts = ChopOptions(output_prefix=str(tmp_path / "single_out"), min_read_len=80)
    st_single = run_chop([tmp_path / "single" / "0"], fq, opts)

    # Two ranks, interleaved input shards, shared output dir.
    for rank in range(2):
        eng = PredictEngine(
            bundle, max_length=512, tokens_per_batch=1 << 12, buckets=[128, 256, 512]
        )
        eng.predict_file(fq, tmp_path / "multi", rank=rank, shard=(rank, 2))
    shard_files = sorted(p.name for p in (tmp_path / "multi" / "0").iterdir())
    assert any(f.startswith("0_") for f in shard_files)
    assert any(f.startswith("1_") for f in shard_files)

    opts2 = ChopOptions(output_prefix=str(tmp_path / "multi_out"), min_read_len=80)
    st_multi = run_chop([tmp_path / "multi" / "0"], fq, opts2)

    assert st_multi.predicts_loaded == st_single.predicts_loaded == 40
    a = gzip.open(st_single.output_file, "rb").read()
    b = gzip.open(st_multi.output_file, "rb").read()
    assert a == b


def test_shard_parallel_chop_matches_single_host(tmp_path):
    """Every rank chops its own predicted reads into a BGZF part stream and
    rank 0 concatenates parts + EOF: the decompressed record multiset must
    equal the single-host run (TPU-native replacement for the reference's
    rank-0-rechops-everything contract, deepchopper/models/callbacks.py:25)."""
    from deepchopper_tpu.chop.pipeline import multihost_stream_chop
    from deepchopper_tpu.io.bgzf import BGZF_EOF
    from deepchopper_tpu.io.predicts import load_predicts_from_batch_pts

    rng = np.random.default_rng(1)
    fq = tmp_path / "mh.fq"
    _write_fastq(fq, rng)

    bundle = DeepChopper.new("hyenadna-tiny-1k-seqlen", seed=0)
    engine = PredictEngine(
        bundle, max_length=512, tokens_per_batch=1 << 12, buckets=[128, 256, 512]
    )
    engine.predict_file(fq, tmp_path / "single", rank=0)
    opts = ChopOptions(output_prefix=str(tmp_path / "single_out"), min_read_len=80)
    st_single = run_chop([tmp_path / "single" / "0"], fq, opts)

    for rank in range(2):
        eng = PredictEngine(
            bundle, max_length=512, tokens_per_batch=1 << 12, buckets=[128, 256, 512]
        )
        eng.predict_file(fq, tmp_path / "multi", rank=rank, shard=(rank, 2))

    # In-process ranks: non-zero ranks first (they only write parts), rank 0
    # last (it merges) — a no-op barrier stands in for sync_global_devices.
    barrier_calls: list[str] = []
    stats = None
    for rank in (1, 0):
        own = load_predicts_from_batch_pts(tmp_path / "multi" / "0", pattern=f"{rank}_*")
        assert own and all(int(rid.split("_")[1]) % 2 == rank for rid in own)
        opts2 = ChopOptions(output_prefix=str(tmp_path / "multi_out"), min_read_len=80)
        st = multihost_stream_chop(
            own, fq, opts2, rank=rank, nprocs=2, barrier=barrier_calls.append
        )
        stats = st if rank == 0 else stats
        assert (st is None) == (rank != 0)
    assert len(barrier_calls) == 2

    assert stats.predicts_loaded == st_single.predicts_loaded == 40
    assert stats.total_fq_count == st_single.total_fq_count == 40
    assert stats.total_output_count == st_single.total_output_count

    def records(path):
        lines = gzip.open(path, "rb").read().splitlines()
        assert len(lines) % 4 == 0
        return sorted(tuple(lines[i : i + 4]) for i in range(0, len(lines), 4))

    assert records(stats.output_file) == records(st_single.output_file)
    # Byte-valid bgzip: exactly one EOF marker, at the very end.
    raw = Path(stats.output_file).read_bytes()
    assert raw.endswith(BGZF_EOF) and raw.count(BGZF_EOF) == 1
    # Part streams and sidecars are cleaned up after the merge.
    assert not list(tmp_path.glob(".dc_chop_part_*"))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_jax_distributed(tmp_path):
    """Spawn 2 CPU jax.distributed processes via initialize_distributed()."""
    port = _free_port()
    script = textwrap.dedent(
        """
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        import jax
        jax.config.update("jax_platforms", "cpu")
        from deepchopper_tpu.parallel.mesh import initialize_distributed, process_shard_info
        assert initialize_distributed()
        rank, count = process_shard_info()
        assert count == 2, count
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        import numpy as np
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        def tot(x):
            return jax.lax.psum(x, "data")
        f = jax.jit(
            jax.shard_map(tot, mesh=mesh, in_specs=P("data"), out_specs=P()),
        )
        local = jnp.asarray([float(rank + 1)])
        glob = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), np.asarray(local))
        out = f(glob)
        total = float(np.asarray(out.addressable_data(0))[0])
        assert total == 3.0, total
        outdir = sys.argv[1]
        open(os.path.join(outdir, f"rank{rank}.ok"), "w").write(str(total))
        """
    )
    env = dict(os.environ)
    env.update(
        DC_COORDINATOR=f"127.0.0.1:{port}",
        DC_NUM_PROCESSES="2",
        PYTHONPATH=str(REPO),
    )
    procs = []
    for rank in range(2):
        e = dict(env, DC_PROCESS_ID=str(rank))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script, str(tmp_path)],
                env=e,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                cwd=str(REPO),
            )
        )
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    assert (tmp_path / "rank0.ok").read_text() == "3.0"
    assert (tmp_path / "rank1.ok").read_text() == "3.0"
