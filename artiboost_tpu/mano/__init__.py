from artiboost_tpu.mano.model import ManoModel, load_mano_model, synthetic_mano_model
from artiboost_tpu.mano.layer import ManoLayer, ManoOutput, mano_forward
from artiboost_tpu.mano.axis_layer import hand_axes
