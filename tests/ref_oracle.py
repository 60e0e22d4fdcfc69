"""Import the reference implementation (/root/reference) as a test oracle.

The reference's top-level script (bayesian_optimization.py:10-43) imports a
handful of packages absent from this environment (cv2, seaborn, gpytorch,
skimage, torchvision). None of them participate in the runner code paths we
use as oracles — cv2 only in the SR low-res preview (:1920), gpytorch only in
the BO surrogate (:3547+), seaborn/matplotlib only for plotting (we always run
with plot=False) — so they are stubbed with inert placeholders before import.

Reference code is imported read-only and used ONLY as an oracle in tests
(CLAUDE.md: never copy reference code).
"""

from __future__ import annotations

import sys
import types

REFERENCE = "/root/reference"

_cached = None


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    _stub("torchvision", utils=types.SimpleNamespace(make_grid=None))
    _stub("cv2", resize=None, INTER_NEAREST=0)
    _stub("seaborn", set=lambda *a, **k: None)
    import numpy as np

    def _np_psnr(image_true, image_test, data_range=1.0):
        err = np.mean((np.asarray(image_true, np.float64)
                       - np.asarray(image_test, np.float64)) ** 2)
        return 10.0 * np.log10((data_range ** 2) / err)

    sk = _stub("skimage")
    sk.__path__ = []  # mark as package so submodule imports resolve
    skf = _stub("skimage.feature", peak_local_max=lambda *a, **k: None)
    skm = _stub("skimage.metrics", peak_signal_noise_ratio=_np_psnr)
    sk.feature = skf
    sk.metrics = skm

    # gpytorch: module-level `class ExactGPModel(gpytorch.models.ExactGP)`
    # (bayesian_optimization.py:3547) requires a real base class; everything
    # else is attribute access inside functions we never call.
    class _ExactGP:
        def __init__(self, *a, **k):
            pass

    def _ns(**attrs):
        return types.SimpleNamespace(**attrs)

    _stub(
        "gpytorch",
        models=_ns(ExactGP=_ExactGP),
        means=_ns(ConstantMean=None),
        kernels=_ns(ScaleKernel=None, RBFKernel=None),
        priors=_ns(NormalPrior=lambda *a, **k: None,
                   GammaPrior=lambda *a, **k: None),
        likelihoods=_ns(GaussianLikelihood=None),
        mlls=_ns(ExactMarginalLogLikelihood=None),
        distributions=_ns(MultivariateNormal=None),
        settings=_ns(),
    )


def import_reference():
    """Return the reference ``bayesian_optimization`` module (cached)."""
    global _cached
    if _cached is not None:
        return _cached

    import matplotlib
    matplotlib.use("Agg")
    _install_stubs()

    sys.path.insert(0, REFERENCE)
    try:
        import bayesian_optimization as ref_bo
        # the CT runners lazily `from radon import FastRadonTransform`
        # (bayesian_optimization.py:280,463,672,883) — bind the module into
        # sys.modules while the reference path is still active
        import radon  # noqa: F401
    finally:
        sys.path.remove(REFERENCE)
    _cached = ref_bo
    return _cached
