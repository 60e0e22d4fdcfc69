"""The 16 ``run_{task}_{method}`` entry points — API parity with the
reference's runner functions (bayesian_optimization.py:261-3545), each a thin
closure over the single generic trainer.

Every runner: creates ``save_path/<timestamp>/``, dumps locals.txt, fits,
optionally plots + writes the ``save.npz`` artifact with the reference's key
schema, and returns the final smoothed-reconstruction PSNR (the BO objective,
ref :1444).

``device`` may be a jax.Device, an integer device ordinal, or a string like
"tpu:3" / "cuda:1" (CUDA names map to same-ordinal local devices so the
reference's configs run unchanged).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from ..utils.config import dump_locals
from .problems import build_problem
from .trainer import Method, fit


def resolve_device(device):
    if device is None:
        return None
    if isinstance(device, jax.Device):
        return device
    if isinstance(device, int):
        return jax.devices()[device % jax.device_count()]
    if isinstance(device, str):
        if ":" in device:
            idx = int(device.rsplit(":", 1)[1])
        else:
            idx = 0
        return jax.devices()[idx % jax.device_count()]
    raise ValueError(f"cannot resolve device {device!r}")


def method_for(task: str, method_name: str, overrides: dict) -> Method:
    """Build the Method a ``run_task`` call with these kwargs would use,
    including the audited weight-decay quirks (CT mcd/sgld zero it, :715/:926;
    dip/mfvi runners hardcode 0)."""
    kw = dict(temp=4e-6, sigma=0.01, dropout_p=0.3, weight_decay=3e-4,
              gamma=0.9999)
    kw.update(overrides)
    if task == "ct" or method_name in ("dip", "mfvi"):
        kw["weight_decay"] = 0.0
    return Method(name=method_name, **kw)


def _npz_payload(task, problem, res, method_name):
    """save.npz with the reference's per-task key schema (:1437-1440, :433-435,
    :2039-2041, :3107-3110)."""
    d = {
        "mse_gt": {method_name: res.mse_gt},
        "recons": {method_name: res.recons},
        "uncerts": {method_name: res.uncerts_epi},
        "uncerts_ale": {method_name: res.uncerts_ale},
        "psnrs": {method_name: res.psnrs},
        "ssims": {method_name: res.ssims},
    }
    if task == "den":
        d.update(img_gt=problem.gt_np, img_noisy=problem.target_np,
                 mse_noisy={method_name: res.mse_corrupted})
    elif task == "ct":
        d.update(img_gt=problem.gt_np[None], img_radon=problem.target_np[None],
                 mse_noisy={method_name: res.mse_corrupted})
    elif task == "sr":
        d.update(img_hr=problem.gt_np,
                 img_lr=np.squeeze(problem.target_np),
                 mse_noisy={method_name: res.mse_corrupted})
    elif task == "inp":
        d.update(img_inpainting=problem.gt_np, img_mask=problem.target_np,
                 mse_corrupted={method_name: res.mse_corrupted})
    return d


def run_task(task: str, method_name: str, *, img: int = 0, num_iter: int = 5000,
             lr: float = 3e-4, temp: float = 4e-6, sigma: float = 0.01,
             dropout_p: float = 0.3, weight_decay: float = 3e-4,
             gamma: float = 0.9999, p_sigma: float = 0.1,
             input_depth: int = 16, device=None, index: int = 0,
             seed: int = 42, show_every: int = 100, plot: bool = True,
             save: bool = True, save_path: str = "./logs",
             log_every_chunk: bool = False, metrics_every: int = 1,
             chunk_iters=None, early_stop=None, compute_dtype=None,
             layout: str = "nhwc", **kwargs) -> float:
    """Generic runner; the 16 named wrappers below pin (task, method).

    ``compute_dtype`` ('f32'/'bf16' or a jnp dtype; default f32) and
    ``layout`` ('nhwc'/'auto') are the trainer's perf knobs, threaded from
    run_params so BO sweeps can run the production bf16 + channels-first
    compute path (convergence-validated; see ROADMAP.md)."""
    from ..utils import viz

    # Reference quirk (replicated): the CT mcd/sgld runners zero weight_decay
    # before building the optimizer (:715, :926), so the BO weight_decay axis
    # is a no-op for CT.
    if task == "ct":
        weight_decay = 0.0
    # dip/mfvi runners hardcode weight_decay = 0 (:323, :506, :1129, ...)
    if method_name in ("dip", "mfvi"):
        weight_decay = 0.0

    timestamp = str(time.time())
    out_dir = None
    if plot or save:
        out_dir = Path(save_path) / timestamp
        out_dir.mkdir(parents=True, exist_ok=False)
        dump_locals(str(out_dir / "locals.txt"), dict(
            task=task, bayes=method_name, img=img, num_iter=num_iter, lr=lr,
            temp=temp, sigma=sigma, dropout_p=dropout_p,
            weight_decay=weight_decay, gamma=gamma, p_sigma=p_sigma,
            input_depth=input_depth, device=str(device), seed=seed,
            show_every=show_every, **kwargs))

    rng = np.random.default_rng(seed)
    problem = build_problem(task, method_name, img, p_sigma=p_sigma,
                            input_depth=input_depth, dropout_p=dropout_p,
                            rng=rng)
    dev = resolve_device(device)
    if dev is not None:
        problem.gt = jax.device_put(problem.gt, dev)
        problem.target = jax.device_put(problem.target, dev)
        if problem.mask is not None:
            problem.mask = jax.device_put(problem.mask, dev)
        if problem.op_state is not None:
            problem.op_state = jax.device_put(problem.op_state, dev)

    method = Method(name=method_name, temp=temp, sigma=sigma,
                    dropout_p=dropout_p, weight_decay=weight_decay,
                    gamma=gamma)

    if plot and out_dir is not None:
        imgs = [problem.gt_np]
        if task in ("den",):
            imgs.append(problem.target_np)
        viz.plot_image_grid_png(imgs, str(out_dir / "input.png"))

    def log_fn(i, row):
        if log_every_chunk:
            print(f"[{task}_{method_name} idx={index}] iter {i}: "
                  f"mse={row[0]:.4f} psnr_sm={row[4]:.3f}", flush=True)

    def snapshot_fn(i, recon, epi, ale):
        if plot and out_dir is not None:
            viz.save_image_png(recon, str(out_dir / "out_avg.png"))
            if method_name != "dip":
                viz.save_normalized_png(epi, str(out_dir / "out_var.png"))
                if problem.has_ale:
                    viz.save_normalized_png(ale, str(out_dir / "out_ale.png"))

    res = fit(problem, method, num_iter=num_iter, lr=lr, seed=seed,
              show_every=show_every, rng=rng, device=dev,
              metrics_every=metrics_every, chunk_iters=chunk_iters,
              compute_dtype=compute_dtype, layout=layout,
              collect_snapshots=(plot or save), early_stop=early_stop,
              log_fn=log_fn if log_every_chunk else None,
              snapshot_fn=snapshot_fn if plot else None)

    if plot and out_dir is not None:
        viz.plot_loss(res.mse_corrupted, res.mse_gt, res.psnrs, num_iter,
                      str(out_dir / f"loss_{method_name}.png"),
                      f"MSE {method_name.upper()}")
        with open(out_dir / "locals.txt", "a") as f:
            viz.plot_results({method_name: res.mse_corrupted},
                             {method_name: res.mse_gt},
                             {method_name: res.psnrs},
                             {method_name: res.ssims}, str(out_dir), file=f)
    payload = None
    if save and out_dir is not None:
        payload = _npz_payload(task, problem, res, method_name)

    if method_name != "dip":
        # posterior-predictive summary over 25 MC samples (the reference's
        # "SSIM of 25-sample mean recon", eval_denoising.ipynb cell 22) —
        # drawn from the final posterior with lax.map batching
        import jax.numpy as jnp
        from ..bayes.uncertainty import mc_predict, uncert_regression_gal
        from ..ops.metrics import psnr as psnr_fn, ssim as ssim_fn

        outs = mc_predict(
            lambda p, x, key: problem.net.apply(
                p, x, key=key, training=True,
                dropout_p=(dropout_p if method_name == "mcd" else None)),
            jax.device_put(res.params, dev) if dev else res.params,
            jax.device_put(jnp.asarray(res.net_input), dev)
            if dev else jnp.asarray(res.net_input),
            jax.random.PRNGKey(seed + 77), n_samples=25)
        outs = jnp.asarray(problem.transform(outs))
        mean, ale, epi = uncert_regression_gal(outs, problem.mean_ch)
        mean_c = jnp.clip(mean, 0, 1)
        mc_psnr = float(psnr_fn(problem.gt, mean_c))
        mc_ssim = float(ssim_fn(problem.gt, mean_c))
        if payload is not None:
            payload.update(
                mc_mean_recon=np.asarray(mean_c)[0].transpose(2, 0, 1),
                mc_mean_psnr=mc_psnr, mc_mean_ssim=mc_ssim,
                mc_ale=np.asarray(ale)[0].transpose(2, 0, 1),
                mc_epi=np.asarray(epi)[0].transpose(2, 0, 1))

    if payload is not None:
        np.savez(str(out_dir / "save.npz"), **payload)

    return res.final_psnr


def run_group_interleaved(task: str, method_name: str, candidates,
                          device=None, *, img: int = 0, num_iter: int = 5000,
                          lr: float = 3e-4, p_sigma: float = 0.1,
                          input_depth: int = 16, seed: int = 42,
                          show_every: int = 100, metrics_every: int = 1,
                          chunk_iters=None, early_stop=None,
                          compute_dtype=None, layout: str = "nhwc",
                          plot: bool = False, save: bool = False,
                          save_path: str = "./logs", index: int = 0,
                          **kwargs) -> list:
    """Evaluate several same-method BO candidates on ONE device with
    ``fit_interleaved`` (chunk dispatches round-robined so host work hides
    behind device time). Results are bit-identical to per-candidate
    ``run_task`` calls with the same seed. Artifacts: per-candidate
    locals.txt + loss plot when ``plot``; snapshot images and save.npz need
    the snapshot machinery and are ``run_task``-only (sweeps run save=False).

    Returns the final smoothed PSNR per candidate (NaN where a fit
    diverged). Replaces candidate *processes* per GPU
    (ref bayesian_optimization.py:3756-3768)."""
    from ..parallel.fanout import candidate_kwargs
    from ..utils import viz
    from .trainer import fit_interleaved

    dev = resolve_device(device)
    methods, rngs = [], []
    problem = None
    for cand in candidates:
        rng = np.random.default_rng(seed)
        overrides = candidate_kwargs(method_name, cand)
        # every build consumes the identical host-noise stream the
        # per-candidate run_task would, so each fit's rng state matches
        problem = build_problem(task, method_name, img, p_sigma=p_sigma,
                                input_depth=input_depth,
                                dropout_p=overrides.get("dropout_p", 0.3),
                                rng=rng)
        methods.append(method_for(task, method_name, overrides))
        rngs.append(rng)
    if dev is not None:
        problem.gt = jax.device_put(problem.gt, dev)
        problem.target = jax.device_put(problem.target, dev)
        if problem.mask is not None:
            problem.mask = jax.device_put(problem.mask, dev)
        if problem.op_state is not None:
            problem.op_state = jax.device_put(problem.op_state, dev)

    results = fit_interleaved(
        problem, methods, num_iter=num_iter, lr=lr, seed=seed, rngs=rngs,
        show_every=show_every, metrics_every=metrics_every,
        chunk_iters=chunk_iters, device=dev, early_stop=early_stop,
        compute_dtype=compute_dtype, layout=layout)

    if plot or save:
        for i, (cand, res) in enumerate(zip(candidates, results)):
            # timestamp-named like run_task's artifact dirs, but suffixed:
            # consecutive loop iterations can share a clock tick
            out_dir = Path(save_path) / f"{time.time()}_{i}"
            out_dir.mkdir(parents=True, exist_ok=False)
            dump_locals(str(out_dir / "locals.txt"), dict(
                task=task, bayes=method_name, img=img, num_iter=num_iter,
                lr=lr, seed=seed, device=str(dev), interleaved=True,
                **candidate_kwargs(method_name, cand)))
            if save:
                # same artifact schema as run_task's save.npz (minus the MC
                # posterior-predictive summary — sweep-scale artifacts stay
                # metric-only; run_task produces the full per-run artifact)
                np.savez(str(out_dir / "save.npz"),
                         **_npz_payload(task, problem, res, method_name))
            if plot:
                viz.plot_loss(res.mse_corrupted, res.mse_gt, res.psnrs,
                              num_iter,
                              str(out_dir / f"loss_{method_name}.png"),
                              f"MSE {method_name.upper()}")
    return [res.final_psnr for res in results]


def _make_runner(task, method):
    def runner(img: int = 0, device=None, index: int = 0, **kwargs) -> float:
        return run_task(task, method, img=img, device=device, index=index,
                        **kwargs)
    runner.__name__ = f"run_{task}_{method}"
    runner.__doc__ = (f"{task} task with {method} inference "
                      f"(parity: reference run_{task}_{method})")
    return runner


_TASKS = ("ct", "den", "sr", "inp")
_METHODS = ("dip", "mfvi", "mcd", "sgld")

for _t in _TASKS:
    for _m in _METHODS:
        globals()[f"run_{_t}_{_m}"] = _make_runner(_t, _m)

ALL_RUNNERS = {f"run_{t}_{m}": globals()[f"run_{t}_{m}"]
               for t in _TASKS for m in _METHODS}
