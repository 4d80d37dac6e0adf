"""Asset loaders: HTML hand-texture baking, background pools, ManoAdaptor."""
import os

import jax
import numpy as np
from PIL import Image

from artiboost_tpu.artiboost.renderer import (
    load_backgrounds,
    load_html_hand_colors,
    synthetic_hand_color_bank,
)
from artiboost_tpu.mano.layer import mano_forward
from artiboost_tpu.mano.model import get_mano_model
from artiboost_tpu.models.hpregnet import ManoAdaptor


def _write_hand_obj(d, n_verts=8, color=(255, 0, 0)):
    os.makedirs(d, exist_ok=True)
    tex = np.zeros((4, 4, 3), np.uint8)
    tex[:] = color
    Image.fromarray(tex).save(os.path.join(d, "texture.png"))
    lines = []
    for i in range(n_verts):
        lines.append(f"v {i * 0.1} 0 0")
        lines.append(f"vt 0.5 0.5")
    lines.append("f 1/1 2/2 3/3")
    lines.append(f"f {n_verts - 2}/{n_verts - 2} {n_verts - 1}/{n_verts - 1} {n_verts}/{n_verts}")
    with open(os.path.join(d, "hand.obj"), "w") as f:
        f.write("\n".join(lines))


def test_html_hand_colors_bake(tmp_path):
    root = str(tmp_path)
    _write_hand_obj(os.path.join(root, "html_000"), color=(255, 0, 0))
    _write_hand_obj(os.path.join(root, "html_001"), color=(0, 255, 0))
    _write_hand_obj(os.path.join(root, "html_002"))  # must be skipped (ref skips i==2)
    bank = load_html_hand_colors(root, n_verts=8)
    assert bank.shape == (2, 8, 3)
    # vertices referenced by faces sample the texture; others keep default
    assert np.allclose(np.asarray(bank)[0, 0], [1.0, 0.0, 0.0], atol=0.02)
    assert np.allclose(np.asarray(bank)[1, 0], [0.0, 1.0, 0.0], atol=0.02)


def test_html_missing_returns_none(tmp_path):
    assert load_html_hand_colors(str(tmp_path / "nope")) is None
    assert load_backgrounds(str(tmp_path / "nope")) is None


def test_load_backgrounds(tmp_path):
    d = tmp_path / "bgs"
    os.makedirs(d)
    for i in range(3):
        Image.fromarray(np.full((16, 24, 3), i * 40, np.uint8)).save(d / f"bg_{i}.jpg")
    bank = load_backgrounds(str(d), size=32)
    assert bank.shape == (3, 32, 32, 3)
    assert 0.0 <= float(bank.min()) and float(bank.max()) <= 1.0


def test_synthetic_bank_shape():
    bank = synthetic_hand_color_bank(4)
    assert bank.shape == (4, 778, 3)


def test_mano_adaptor_recovers_joints():
    """Adaptor(verts) must match the FK joints at any pose: both are the
    same linear regressor + tip picks applied to the posed mesh."""
    model = get_mano_model()
    adaptor = ManoAdaptor(mano_model=model)
    import jax.numpy as jnp

    pose = jax.random.normal(jax.random.PRNGKey(0), (2, 48)) * 0.1
    shape = jnp.zeros((2, 10))
    out = mano_forward(model, pose, shape, center_idx=None)
    variables = adaptor.init(jax.random.PRNGKey(0), out.verts)
    joints = adaptor.apply(variables, out.verts)
    assert joints.shape == (2, 21, 3)
    err = np.abs(np.asarray(joints) - np.asarray(out.joints)).max()
    # J_regressor acts on the *rest* mesh inside FK while the adaptor acts
    # on the posed mesh; they agree to LBS-deformation tolerance
    assert err < 0.02, err


def test_refiner_params_roundtrip(tmp_path):
    import jax.numpy as jnp
    from artiboost_tpu.artiboost.refiner import (
        RefineNet, build_refiner, load_refiner_params, save_refiner_params)

    net = RefineNet()
    params = net.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 778)), jnp.zeros((1, 96)), jnp.zeros((1, 3)))
    path = str(tmp_path / "refiner.npz")
    save_refiner_params(params, path)
    loaded = load_refiner_params(path)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    model = get_mano_model()
    refine = build_refiner({"TYPE": "hand_obj", "PRETRAINED": path}, model)
    feed = {"hand_pose": jnp.zeros((2, 48)), "hand_tsl": jnp.zeros((2, 3))}
    out = refine(feed, jnp.zeros((2, 64, 3)), jnp.ones((2, 64)))
    assert out["hand_verts"].shape == (2, 778, 3)


def test_obj_uv_texture_bake(tmp_path):
    from artiboost_tpu.artiboost.object_library import load_obj_file

    d = tmp_path / "obj"
    os.makedirs(d)
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, :4] = (255, 0, 0)   # left half red
    tex[:, 4:] = (0, 0, 255)   # right half blue
    Image.fromarray(tex).save(d / "texture_map.png")
    obj = "\n".join([
        "v 0 0 0", "v 1 0 0", "v 0 1 0",
        "vt 0.1 0.5", "vt 0.9 0.5", "vt 0.1 0.5",
        "f 1/1 2/2 3/3",
    ])
    (d / "model.obj").write_text(obj)
    verts, faces, colors = load_obj_file(str(d / "model.obj"))
    assert verts.shape == (3, 3) and faces.shape == (1, 3)
    assert np.allclose(colors[0], [1, 0, 0], atol=0.02)
    assert np.allclose(colors[1], [0, 0, 1], atol=0.02)


def test_obj_vertex_colors_win(tmp_path):
    from artiboost_tpu.artiboost.object_library import load_obj_file

    d = tmp_path / "obj2"
    os.makedirs(d)
    obj = "\n".join([
        "v 0 0 0 0.5 0.25 0.125", "v 1 0 0 0.5 0.25 0.125", "v 0 1 0 0.5 0.25 0.125",
        "f 1 2 3",
    ])
    (d / "model.obj").write_text(obj)
    _, _, colors = load_obj_file(str(d / "model.obj"))
    assert np.allclose(colors, [[0.5, 0.25, 0.125]] * 3)
