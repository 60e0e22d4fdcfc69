from .sgld import (sgld, psgld, add_param_noise, param_noise_transform,
                   exponential_decay_floored)
