"""Bisect the tree-MSM gather0 compile SIGKILL on the axon helper.

Stages: (a) raw jnp.take at tree shapes; (b) gather + unpack/select/pack
(the full _gather0_impl); (c) _pack_affine.  Sizes 2^16 source rows,
output slots 2^20 -> 2^23.  Run on the real chip."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from contangle_zkcp_tpu.curves import instances as ci
from contangle_zkcp_tpu.curves.weierstrass import SWDevice
from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.ops.msm_tree import TreeMSM

dev = SWDevice(fi.bls12_381_fq(), ci.BLS12_381_G1)
msm = TreeMSM(dev, scalar_bits=255, c=12, signed=True)
W = msm._W
src = jnp.asarray(np.random.RandomState(0).randint(0, 1<<16, size=(1<<16, W), dtype=np.int64).astype(np.uint32))

for stage in os.environ.get("STAGES", "a,b").split(","):
    for lg in (20, 22, 23):
        n = 1 << lg
        idx = jnp.asarray(np.random.RandomState(1).randint(0, 1<<16, size=n).astype(np.int32))
        v0 = jnp.asarray(np.ones(n, dtype=bool))
        sg = jnp.asarray(np.zeros(n, dtype=np.int8))
        t0 = time.time()
        try:
            if stage == "a":
                out = jax.jit(lambda s, i: jnp.take(s, i, axis=0))(src, idx)
            else:
                out = msm._gather0_jit(src, idx, v0, sg)
            out.block_until_ready()
            print(json.dumps({"stage": stage, "log2slots": lg, "ok": True,
                              "sec": round(time.time()-t0, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"stage": stage, "log2slots": lg, "ok": False,
                              "err": str(e)[:160]}), flush=True)
            break
