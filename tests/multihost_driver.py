"""Subprocess driver for the N-process multihost test (SURVEY.md §4: spawn
N processes under jax.distributed.initialize on the CPU platform).

argv: process_id num_processes port infile outfile swap stream_symbols

Each process takes its contiguous shard of the input (process order = file
order); with swap=1 the two shards are deliberately exchanged, which must
produce a container that does NOT decode to the original file (the
misordered-stitch failure case the round-2 VERDICT demanded coverage for).
Host 0 writes the assembled container to outfile.
"""

import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # no virtual device fan-out: 1 device/proc
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    infile, outfile, mode, S = sys.argv[4], sys.argv[5], sys.argv[6], int(sys.argv[7])
    swap = mode == "1"          # exchange shards 0 and 1 (misorder case)
    misalign = mode == "2"      # equal byte split, NOT stream-aligned

    import jax

    # The axon TPU plugin ignores JAX_PLATFORMS (see tests/conftest.py);
    # force the CPU platform through the config as well.
    jax.config.update("jax_platforms", "cpu")
    # CPU multiprocess needs the gloo collectives backend picked before the
    # CPU client is instantiated (otherwise process_count() stays 1).
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()

    data = open(infile, "rb").read()
    # shard boundaries must sit on stream boundaries (only the last shard
    # may hold a partial stream) — multihost.compress_bytes_multihost
    # rejects anything else; mode 2 violates this on purpose
    if misalign:
        bounds = [len(data) * i // nproc for i in range(nproc + 1)]
    else:
        bounds = [min(len(data) * i // nproc // S * S, len(data))
                  for i in range(nproc)] + [len(data)]
    take = pid
    if swap and nproc >= 2:
        take = {0: 1, 1: 0}.get(pid, pid)
    shard = data[bounds[take] : bounds[take + 1]]

    from glz_tpu.parallel import multihost

    blob = multihost.compress_bytes_multihost(shard, stream_symbols=S)
    if jax.process_index() == 0:
        with open(outfile, "wb") as f:
            f.write(blob)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
