"""Native RefineNet training recipe (the GrabNet-checkpoint replacement)."""
import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.artiboost.grasp_library import synthetic_grasp_library
from artiboost_tpu.artiboost.object_library import synthetic_object_library
from artiboost_tpu.artiboost.refiner import (RefineNet, build_refiner,
                                             make_refiner_train_step,
                                             save_refiner_params)
from artiboost_tpu.artiboost.scrambler import build_scrambler
from artiboost_tpu.mano.model import get_mano_model


def _setup():
    mano = get_mano_model()
    obj_lib = synthetic_object_library(["a", "b"], v_max=128, f_max=256)
    grasp_lib = synthetic_grasp_library(2, 4)
    scrambler = build_scrambler({"TYPE": "naive", "HAND_TSL_SIGMA": 0.02})
    return mano, obj_lib, grasp_lib, scrambler


def test_refiner_train_step_reduces_loss(key):
    mano, obj_lib, grasp_lib, scrambler = _setup()
    net = RefineNet(h_size=64)
    init_fn, step_fn = make_refiner_train_step(
        mano, net, scrambler, n_iters=2, learning_rate=3e-4)
    params, opt_state = init_fn(key)

    B = 4
    oid = jnp.asarray(np.array([0, 1, 0, 1], np.int32))
    gid = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
    pose, shape, tsl = grasp_lib.gather(oid, gid)
    ov, om = obj_lib.verts[oid], obj_lib.vert_valid[oid]

    losses = []
    for i in range(8):
        params, opt_state, metrics = step_fn(
            params, opt_state, jax.random.fold_in(key, i),
            pose, shape, tsl, ov, om)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # zero-init delta heads start as identity; training must make progress
    assert min(losses[4:]) < losses[0]


def test_trained_params_roundtrip_into_build_refiner(key, tmp_path):
    mano, obj_lib, grasp_lib, scrambler = _setup()
    net = RefineNet(h_size=64)
    init_fn, step_fn = make_refiner_train_step(mano, net, scrambler, n_iters=1)
    params, opt_state = init_fn(key)
    oid = jnp.asarray(np.array([0, 1], np.int32))
    gid = jnp.asarray(np.array([0, 1], np.int32))
    pose, shape, tsl = grasp_lib.gather(oid, gid)
    params, _, _ = step_fn(params, opt_state, key, pose, shape, tsl,
                           obj_lib.verts[oid], obj_lib.vert_valid[oid])

    path = tmp_path / "refiner.npz"
    save_refiner_params(params, str(path))
    # build_refiner constructs the default-width RefineNet; the loaded
    # params must drive it (shape mismatch would fail in apply) — so save
    # default-width params for the roundtrip
    net_full = RefineNet()
    init_full, _ = make_refiner_train_step(mano, net_full, scrambler, n_iters=1)
    params_full, _ = init_full(key)
    save_refiner_params(params_full, str(path))

    refiner = build_refiner(
        {"TYPE": "hand_obj", "ITERS": 1, "PRETRAINED": str(path)}, mano)
    out = refiner({"hand_pose": pose, "hand_tsl": tsl, "hand_shape": shape},
                  obj_lib.verts[oid], obj_lib.vert_valid[oid])
    assert out["hand_verts"].shape == (2, 778, 3)
    assert np.isfinite(np.asarray(out["hand_verts"])).all()
