import artiboost_tpu.models.resnet  # noqa: F401  (registers backbones)
import artiboost_tpu.models.integral_head  # noqa: F401
import artiboost_tpu.models.mlp  # noqa: F401
import artiboost_tpu.models.hybrid_baseline  # noqa: F401
import artiboost_tpu.models.simple_baseline  # noqa: F401
import artiboost_tpu.models.hpregnet  # noqa: F401
import artiboost_tpu.models.honet  # noqa: F401

from artiboost_tpu.models.arch import Arch, build_arch  # noqa: F401
