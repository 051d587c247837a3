"""Mesh-pipelined Nova fold of a PoE instance stream (BASELINE config
#5's distributed shape): k satisfied instances tree-fold into ONE
relaxed accumulator with each level's cross-term commitments computed
as one sharded multi-vector MSM on the 8-device CPU mesh, and the
result is bit-identical to the sequential host fold (same Fiat-Shamir
transcript).
"""

import random

import pytest

from contangle_zkcp_tpu.groth16.folding import FoldingScheme
from tests.test_folding import _mini_poe_cs


@pytest.fixture(scope="module")
def mesh():
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    assert len(devs) >= 8, "conftest forces an 8-device CPU mesh"
    import numpy as np

    return Mesh(np.array(devs[:8]), ("points",))


@pytest.fixture(scope="module")
def stream():
    css = [_mini_poe_cs(4, s) for s in (11, 22, 33, 44)]
    scheme = FoldingScheme(css[0])
    lifted = [scheme.instance_from_cs(cs) for cs in css]
    return scheme, lifted


def test_mesh_fold_stream_matches_host(mesh, stream):
    from contangle_zkcp_tpu.parallel.fold_pipeline import MeshFoldPipeline

    scheme, lifted = stream
    pipe = MeshFoldPipeline(scheme, mesh)
    inst_m, wit_m = pipe.fold_stream(lifted)

    # sequential host fold over the same tree shape
    level = list(lifted)
    while len(level) > 1:
        nxt = [
            scheme.fold(*level[i], *level[i + 1])
            for i in range(0, len(level) - 1, 2)
        ]
        if len(level) % 2:
            nxt.append(level[-1])
        level = nxt
    inst_h, wit_h = level[0]

    assert inst_m.comm_w == inst_h.comm_w
    assert inst_m.comm_e == inst_h.comm_e
    assert inst_m.u == inst_h.u
    assert inst_m.x == inst_h.x
    assert wit_m.w == wit_h.w and wit_m.e == wit_h.e
    assert scheme.check(inst_m, wit_m)


def test_mesh_fold_rejects_tampered_witness(mesh, stream):
    from contangle_zkcp_tpu.parallel.fold_pipeline import MeshFoldPipeline

    scheme, lifted = stream
    pipe = MeshFoldPipeline(scheme, mesh)
    inst, wit = pipe.fold_stream(lifted)
    wit.w[0] = (wit.w[0] + 1) % scheme.p
    assert not scheme.check(inst, wit)
