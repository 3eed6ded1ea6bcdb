from .datasets import LiftingDataset, LiftingDatasetV2
from .diffusion import LiftingDiffusionModel, compute_noise_scheduling
from .distributions import (
    BivariateVonMisesMixture,
    EasyDist,
    HardBimodalDist,
    HardQuadmodalDist,
    HardUnimodalDist,
    LiftingDist1Dto2D,
    LiftingDist2Dto3D,
    MixtureVonMises,
    torus_angles_to_cartesian,
    torus_cartesian_to_angles,
    torus_scenario,
)
from .metrics import (
    calc_mpjpe,
    calc_mpjpe_3d,
    distance_to_circle,
    oracle_multihyp_mpjpe,
    std_length,
)
from .models import (
    ConstrainedMlp,
    ConstrainedMlpRmcl,
    ConstrainedMlpRmclV2,
    ConstrainedMlpV2,
    ToyMlp,
    aggregate_toy_hypotheses,
    wta_with_scoring_l2_loss,
    wta_with_scoring_l2_loss_v2,
)
from .trainer import ToyTrainer, ToyTrainerConfig
