"""mfvi_dip_mia_tpu — a TPU-native (JAX/XLA/Pallas) framework for posterior-
temperature-optimized Bayesian inverse models (POTOBIM).

Re-implements, TPU-first, the capabilities of the reference PyTorch research
code (Cardio-AI/mfvi-dip-mia): unsupervised single-image inverse problems
(denoising, super-resolution, inpainting, CT reconstruction) solved with a
Deep Image Prior skip U-Net under four inference modes (plain DIP, mean-field
VI, MC dropout, SGLD), plus a Gaussian-process Bayesian-optimization loop that
tunes posterior temperature / prior variance and fans candidate fits out
across TPU devices.

Architecture (nothing here is a port of the reference's torch modules):
  * ``nn``       — pure init/apply functions over parameter pytrees (skip U-Net)
  * ``bayes``    — variational/MC-dropout/uncertainty transforms on pytrees
  * ``ops``      — task physics (Radon, resizing) + metrics/losses (+ Pallas)
  * ``optim``    — optax gradient transformations (SGLD family, noise inject)
  * ``tasks``    — the single generic jit'd trainer + task/method registry
  * ``bo``       — exact GP surrogate, acquisition, BO outer loop (JAX)
  * ``parallel`` — candidate->device fanout and sharded multi-chip steps
  * ``utils``    — host-side image I/O, configs, plotting, profiling
"""

__version__ = "0.1.0"

# Public API — the names a reference (get_net / BayTorch / train_*) user
# reaches for first, re-exported from their home submodules. Heavy optional
# subsystems (bo, parallel, tasks) stay lazy: import them explicitly.
from .nn.skip import SkipNet, build_skip_net                     # noqa: E402
from .bayes.vi import to_mfvi, kl_mfvi, kl_mfvi_mc               # noqa: E402
from .bayes.uncertainty import (mc_predict,                      # noqa: E402
                                uncert_regression_gal)
from .ops.losses import gaussian_nll, gaussian_nll_masked        # noqa: E402
from .ops.metrics import psnr, ssim                              # noqa: E402

__all__ = [
    "SkipNet", "build_skip_net", "to_mfvi", "kl_mfvi", "kl_mfvi_mc",
    "mc_predict", "uncert_regression_gal", "gaussian_nll",
    "gaussian_nll_masked", "psnr", "ssim", "__version__",
]
