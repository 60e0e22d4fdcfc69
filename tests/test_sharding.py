"""Multi-chip sharding: mesh construction + the full sharded sweep step on
the 8-virtual-device CPU mesh (what the driver's dryrun exercises)."""

import sys

import numpy as np
import pytest
import jax

from mfvi_dip_mia_tpu.parallel import sharding as sh


def test_make_mesh_factorization():
    mesh = sh.make_mesh(8)
    assert mesh.shape["cand"] * mesh.shape["mc"] == 8
    mesh2 = sh.make_mesh(4, shape=(2, 2))
    assert dict(mesh2.shape) == {"cand": 2, "mc": 2}


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove("/root/repo")
    g.dryrun_multichip(8)  # asserts finite losses internally


def test_entry_shapes():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove("/root/repo")
    fn, args = g.entry()
    # abstract evaluation only: compiling the 256^2 flagship on CPU is the
    # driver's job; here we check the program is traceable and well-shaped
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape[0].shape == ()
    assert out_shape[1].shape == (1, 256, 256, 2)
