import artiboost_tpu.datasets.dexycb  # noqa: F401  (registers DexYCB)
import artiboost_tpu.datasets.fhb  # noqa: F401  (registers FPHB)
import artiboost_tpu.datasets.ho3d  # noqa: F401  (registers HO3D/HO3DV3)
import artiboost_tpu.datasets.synthetic  # noqa: F401  (registers SyntheticHO)

from artiboost_tpu.datasets.hodata import HODataset, ho_collate  # noqa: F401
from artiboost_tpu.datasets.hoquery import Queries, SynthQueries  # noqa: F401
