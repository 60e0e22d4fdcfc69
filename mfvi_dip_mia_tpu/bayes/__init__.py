from .vi import (to_mfvi, kl_mfvi, apply_conv_leaf, is_conv_leaf,
                 is_variational_leaf, posterior_mean_params)
from . import priors
from . import uncertainty
