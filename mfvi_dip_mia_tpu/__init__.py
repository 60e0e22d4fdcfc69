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
