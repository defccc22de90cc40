"""Subprocess driver for the N-process multihost tests (SURVEY.md §4: spawn
N processes under jax.distributed.initialize on the CPU platform).

argv: process_id num_processes port infile outfile mode stream_symbols kind [group_rows]

kind selects the path: "byte" (bitstream layout, host encode), "lockstep"
(layout-2 Pallas byte path), "huffword" (layout-2 dual-dictionary path).
mode: 0 = normal, 1 = shards 0/1 deliberately exchanged (must produce a
container that does NOT decode to the original file), 2 = deliberately
misaligned shard boundaries (must be rejected loudly).

Each process takes its contiguous shard of the input (process order = file
order); host 0 writes the assembled container to outfile.
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
    kind = sys.argv[8] if len(sys.argv) > 8 else "byte"
    rows = int(sys.argv[9]) if len(sys.argv) > 9 else 8
    swap = mode == "1"          # exchange shards 0 and 1 (misorder case)
    misalign = mode == "2"      # equal byte split, NOT stream/group-aligned

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
    from glz_tpu import config as cfg
    from glz_tpu.parallel import multihost

    # shard boundaries must sit on stream/group boundaries (only the last
    # shard may hold a partial one) — the multihost entry points reject
    # anything else; mode 2 violates this on purpose
    if kind == "huffword":
        align = None  # token-based: planned by split_huffword_shards
    elif kind == "lockstep":
        align = rows * 128 * S  # group_rows * 128 * stream_symbols bytes
    else:
        align = S
    if misalign:
        bounds = [len(data) * i // nproc for i in range(nproc + 1)]
    elif kind == "huffword":
        plan_conf = cfg.GlzConfig(stream_symbols=S, layout=cfg.LAYOUT_LOCKSTEP,
                                  group_rows=rows)
        bounds = multihost.split_huffword_shards(data, nproc, plan_conf)
    else:
        bounds = [min(len(data) * i // nproc // align * align, len(data))
                  for i in range(nproc)] + [len(data)]
    take = pid
    if swap and nproc >= 2:
        take = {0: 1, 1: 0}.get(pid, pid)
    shard = data[bounds[take] : bounds[take + 1]]

    if kind in ("dec", "dec_hw"):
        # shard-parallel decompress: infile is a lockstep .glz container;
        # each process writes its (offset, bytes) slice to its own part
        # file — the test (or a real driver via pwrite) assembles them
        fn = (multihost.decompress_huffword_multihost if kind == "dec_hw"
              else multihost.decompress_bytes_multihost)
        local, byte0 = fn(data)
        with open(f"{outfile}.part{pid}", "wb") as f:
            f.write(byte0.to_bytes(8, "little") + local)
        jax.distributed.shutdown()
        return
    checksum = os.environ.get("GLZ_MH_CHECKSUM") == "1"
    if kind == "huffword":
        conf = cfg.GlzConfig(stream_symbols=S, layout=cfg.LAYOUT_LOCKSTEP,
                             group_rows=rows, checksum=checksum)
        blob = multihost.compress_huffword_multihost(shard, conf)
    elif kind == "lockstep":
        conf = cfg.GlzConfig(stream_symbols=S, layout=cfg.LAYOUT_LOCKSTEP,
                             group_rows=rows, checksum=checksum)
        blob = multihost.compress_bytes_multihost(shard, conf)
    else:
        blob = multihost.compress_bytes_multihost(
            shard, cfg.GlzConfig(stream_symbols=S, checksum=checksum))
    if jax.process_index() == 0:
        with open(outfile, "wb") as f:
            f.write(blob)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
