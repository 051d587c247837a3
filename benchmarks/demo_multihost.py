"""Two-process jax.distributed demo: the REAL multi-host code path.

The virtual 8-device CPU mesh used by the test suite and by
dryrun_multichip validates shard_map programs in ONE process; this demo
exercises the code path a real TPU pod would use — N separate processes,
`jax.distributed.initialize` against a coordinator, a global mesh whose
devices span processes, and cross-process collectives — on the CPU
backend (SURVEY.md §2.3.6/§5.8; no multi-host TPU hardware is reachable
from this container).

Each process owns one host CPU device.  The demo builds the global
2-device mesh, checks a cross-process shard_map psum exactly, then runs
the framework's FourStepNTT (jax.lax.all_to_all transposes riding the
process boundary) at 2^10 and checks it bit-exactly against the
single-device NTT engine run locally on rank 0.

Run: python -u benchmarks/demo_multihost.py          (spawns both ranks)
"""

import json
import os
import subprocess
import sys
import time

NPROC = 2
# coordinator port: the launcher binds port 0 to find a free one and
# passes it to ranks via env (a fixed port deadlocked on collision,
# ADVICE.md r4); 19731 remains the fallback for direct rank launches.
PORT = int(os.environ.get("DEMO_MULTIHOST_PORT", "19731"))


def rank_main(rank: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC,
        process_id=rank,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    try:
        from jax import shard_map
    except ImportError:  # older JAX
        from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == NPROC, jax.process_count()
    devs = np.array(jax.devices()[:NPROC])
    assert len({d.process_index for d in devs}) == NPROC, (
        "mesh devices must span processes"
    )
    mesh = Mesh(devs, ("hosts",))

    # ---- cross-process psum, checked exactly
    xh = np.arange(NPROC * 4, dtype=np.int32).reshape(NPROC, 4)
    x = jax.device_put(xh, NamedSharding(mesh, P("hosts", None)))
    f = jax.jit(
        shard_map(
            lambda v: jax.lax.psum(v, "hosts"),
            mesh=mesh,
            in_specs=P("hosts", None),
            out_specs=P("hosts", None),
        )
    )
    got = np.asarray(multihost_utils.process_allgather(f(x), tiled=True))
    ok_psum = bool((got == np.tile(xh.sum(axis=0), (NPROC, 1))).all())

    # ---- the framework's distributed NTT across the process boundary
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import random

    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.ops.ntt import NTT
    from contangle_zkcp_tpu.parallel.ntt_sharded import FourStepNTT

    Fr = fi.bls12_381_fr()
    d = 1 << 10
    rng = random.Random(5)
    vals = [rng.randrange(Fr.p) for _ in range(d)]
    a = jnp.asarray(Fr.encode(vals))
    four = FourStepNTT(Fr, d, mesh, axis="hosts")
    t0 = time.time()
    ev = four.forward(a)
    ev_host = np.asarray(multihost_utils.process_allgather(ev, tiled=True))
    t_ntt = time.time() - t0

    if rank == 0:
        ok_ntt = Fr.decode(jnp.asarray(ev_host)) == Fr.decode(NTT(Fr, d).forward(a))
        print(
            json.dumps(
                {
                    "demo": "jax.distributed 2-process CPU",
                    "process_count": jax.process_count(),
                    "global_devices": len(jax.devices()),
                    "psum_exact": ok_psum,
                    "fourstep_ntt_2^10_exact": bool(ok_ntt),
                    "ntt_sec": round(t_ntt, 3),
                }
            ),
            flush=True,
        )
        assert ok_psum and ok_ntt
    jax.distributed.shutdown()


def main():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    env = dict(os.environ, DEMO_MULTIHOST_PORT=str(port))
    for r in range(NPROC):
        e = dict(env, DEMO_MULTIHOST_RANK=str(r))
        procs.append(subprocess.Popen([sys.executable, "-u", __file__], env=e))
    rcs = []
    deadline = time.time() + 600
    for p in procs:
        try:
            rcs.append(p.wait(timeout=max(1, deadline - time.time())))
        except subprocess.TimeoutExpired:
            p.kill()
            rcs.append(-9)
    print(json.dumps({"ranks": rcs, "ok": all(rc == 0 for rc in rcs)}), flush=True)
    sys.exit(0 if all(rc == 0 for rc in rcs) else 1)


if __name__ == "__main__":
    if "DEMO_MULTIHOST_RANK" in os.environ:
        rank_main(int(os.environ["DEMO_MULTIHOST_RANK"]))
    else:
        main()
