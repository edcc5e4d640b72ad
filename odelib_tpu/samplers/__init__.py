from .advi import (ADVIResult, advi, advi_custom, psis_weights,
                   resample_indices)
from .amh import adaptive_metropolis
from .ensemble import ensemble_mh
from .joint import JointOutput, joint_metropolis_hastings, joint_survey
from .hmc import (hamiltonian_mc, hamiltonian_mc_checkpointed,
                  hamiltonian_mc_custom,
                  hamiltonian_mc_custom_checkpointed)
from .lhs import lhs_unit, sample_lhs
from .mh import MHOutput, equilibriums, metropolis_hastings, survey
from .optimize import MAPResult, map_fit, map_fit_custom
from .pf import (PMMHOutput, obs_blocks, particle_filter_chi,
                 pmmh, pmmh_checkpointed, tune_particles)
from .pt import (parallel_tempering,
                 parallel_tempering_checkpointed, tune_ladder)
from .smc import SMCOutput, smc_sample

__all__ = ["lhs_unit", "sample_lhs", "MHOutput", "metropolis_hastings",
           "survey", "equilibriums", "hamiltonian_mc",
           "hamiltonian_mc_checkpointed", "hamiltonian_mc_custom",
           "hamiltonian_mc_custom_checkpointed",
           "parallel_tempering", "map_fit", "MAPResult", "ensemble_mh",
           "smc_sample", "SMCOutput", "adaptive_metropolis",
           "joint_metropolis_hastings", "joint_survey", "JointOutput",
           "advi", "advi_custom", "ADVIResult", "map_fit_custom",
           "psis_weights", "resample_indices",
           "pmmh", "PMMHOutput", "particle_filter_chi", "obs_blocks",
           "pmmh_checkpointed", "tune_particles",
           "parallel_tempering_checkpointed", "tune_ladder"]
