"""bfloat16 compute path: ARCH.DTYPE cascades to submodules and the
forward stays numerically close to f32 (params are f32 either way;
geometry/softmax pin f32 inside the modules)."""
import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.models import build_arch
from artiboost_tpu.utils.misc import resolve_dtype

ARCH_CFG = {
    "TYPE": "HybridBaseline",
    "BACKBONE": {"TYPE": "ResNet18", "PRETRAINED": False},
    "HYBRID_HEAD": {
        "TYPE": "IntegralDeconvHead", "NCLASSES": 22, "INPUT_CHANNEL": 512,
        "DEPTH_RESOLUTION": 8, "HEATMAP_SIZE": [8, 8],
        "NUM_DECONV_LAYERS": 2, "NUM_DECONV_FILTERS": [64, 64],
        "NUM_DECONV_KERNELS": [4, 4], "FINAL_CONV_KERNEL": 1,
    },
    "BOX_HEAD": {"TYPE": "MLP_O", "LAYERS_N": [512, 64], "OUT_CHANNEL": 6},
    "PREVIOUS": [],
}
PRESET = {"IMAGE_SIZE": [64, 64], "CENTER_IDX": 0}


def _batch(B=2, res=64):
    rng = np.random.RandomState(0)
    intr = np.tile(np.array([[435.0, 0, res / 2], [0, 435.0, res / 2], [0, 0, 1]],
                            np.float32), (B, 1, 1))
    return {
        Queries.IMAGE: rng.rand(B, res, res, 3).astype(np.float32),
        Queries.ROOT_JOINT: np.tile([0, 0, 0.5], (B, 1)).astype(np.float32),
        Queries.CAM_INTR: intr,
        Queries.CORNERS_CAN: rng.randn(B, 8, 3).astype(np.float32) * 0.05,
    }


def test_resolve_dtype():
    assert resolve_dtype(None) == jnp.float32
    assert resolve_dtype("bfloat16") == jnp.bfloat16
    assert resolve_dtype("BF16") == jnp.bfloat16
    assert resolve_dtype("float32") == jnp.float32
    assert resolve_dtype(jnp.bfloat16) == jnp.bfloat16


def test_bf16_forward_close_to_f32():
    batch = _batch()
    arch32 = build_arch(dict(ARCH_CFG), PRESET)
    arch16 = build_arch({**ARCH_CFG, "DTYPE": "bfloat16"}, PRESET)
    variables = arch32.init(jax.random.PRNGKey(0), batch, train=False)
    # params are f32 in both; the bf16 arch must accept the same pytree
    out32 = arch32.apply(variables, batch, train=False)
    out16 = arch16.apply(variables, batch, train=False)
    assert out16["joints_3d_abs"].dtype == jnp.float32
    # uvd space is [0,1]^3 over a 0.4m depth range; bf16 conv noise stays small
    drift = np.abs(np.asarray(out32["joints_3d_abs"])
                   - np.asarray(out16["joints_3d_abs"]))
    assert drift.max() < 5e-3, f"bf16 drift too large: {drift.max()}"
