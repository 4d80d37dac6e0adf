import artiboost_tpu.criterions.jointloss  # noqa: F401
import artiboost_tpu.criterions.ordinal  # noqa: F401
import artiboost_tpu.criterions.symcornerloss  # noqa: F401
import artiboost_tpu.criterions.honetloss  # noqa: F401
import artiboost_tpu.criterions.alignloss  # noqa: F401
import artiboost_tpu.criterions.chamferloss  # noqa: F401

from artiboost_tpu.criterions.criterion import Criterion, TensorLoss, build_criterion  # noqa: F401
