"""Task definitions: data -> operator -> loss/transform/metrics closures.

This is the collapse of the reference's 16 copy-pasted ~200-line runners
(bayesian_optimization.py:261-3545) into data: a `Problem` carries the
device-resident tensors + static config, and per-(task, method) closures
encode the audited loss/transform matrix:

  task | method        | data loss                                 | post-loss transform
  -----+---------------+-------------------------------------------+--------------------
  ct   | all           | mse(radon(out), radon(gt))      (:377)     | none (1 channel)
  den  | dip, sgld     | mse(out[:1], noisy)             (:1177)    | sgld: ch1 -> exp(-ch1)
  den  | mfvi, mcd     | gaussian_nll(out[:1], out[1:], noisy)      | ch1 -> exp(-ch1)
  sr   | dip           | mse(down(out)[:1], lr_img)      (:1985)    | none
  sr   | mfvi,mcd,sgld | gaussian_nll on down(out)       (:2185)    | ch1 -> exp(-ch1)
  inp  | dip           | mse(sigmoid(out[:3])*m, gt*m)   (:2826)    | :3 -> sigmoid
  inp  | mfvi          | nll_masked(sigmoid(out[:3]), out[3:], gt, m)| :3 sigmoid, 3: exp(-)
  inp  | mcd, sgld     | nll_masked(sigmoid(out[:3]), out[3:], gt, m)| :3 sigmoid, 3: exp(-)
       (mcd :3249 / sgld :3464 sigmoid IN-PLACE via out[:, :3].sigmoid_() —
        round-2 read this as "no sigmoid"; the round-3 oracle row caught it
        at -7 dB and the in-place semantics are now replicated)

Net configs (audited):
  ct/den/sr: 5-scale [16,32,64,128,128], skip 4, bilinear up, reflection pad,
             n_out = 1 (ct) / 2 (den, sr); mcd adds always-on dropout2d on the
             down and up convs (:737-741, :1533-1537).
  inp dip/mfvi/sgld: 6-scale [16..128x3], no skips, k5/k3, nearest up,
             no 1x1-up, n_out=4, no sigmoid in net (:2970-2998).
  inp mcd:   5-scale get_net, skip=0, bilinear, n_out=4, dropout2d (:3196-3232).
  sr mcd only: conv weights re-initialized ~ N(0, 0.1) (init_normal, :2379) —
             reference quirk, replicated.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import SkipNet, build_skip_net
from ..nn import init as init_lib
from ..ops import losses
from ..ops.radon import FastRadonTransform
from ..nn import layers
from ..utils import images as I
from . import data as D


@dataclasses.dataclass
class Problem:
    task: str                     # 'den' | 'sr' | 'inp' | 'ct'
    method: str                   # 'dip' | 'mfvi' | 'mcd' | 'sgld'
    net: SkipNet
    input_depth: int
    imsize: tuple                 # (H, W)
    mean_ch: int                  # 1 (gray) or 3 (rgb)
    gt: jnp.ndarray               # (1,H,W,C) ground truth (device)
    target: jnp.ndarray           # loss target (noisy / lr image / sinogram / gt)
    mask: Optional[jnp.ndarray]   # inpainting mask, rounded (1=known)
    operator: Optional[Callable]  # forward operator applied to net output
    gt_np: np.ndarray             # (C,H,W) host copies for artifacts
    target_np: np.ndarray
    sr_factor: int = 4
    has_ale: bool = False         # network outputs a neg-logvar channel used
    init_normal_std: Optional[float] = None  # sr_mcd quirk
    # operator state (e.g. the Radon projection matrix): a device array that
    # must flow through jit as an ARGUMENT — the trainer threads it via the
    # data dict so multi-GB operators never become captured constants.
    op_state: Optional[jnp.ndarray] = None

    def apply_operator(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.op_state is not None:
            return self.operator(x, self.op_state)
        return self.operator(x)

    # -- loss ---------------------------------------------------------------
    def data_loss(self, out: jnp.ndarray) -> jnp.ndarray:
        t, m = self.task, self.method
        if t == "ct":
            return losses.mse_loss(self.apply_operator(out), self.target)
        if t == "den":
            if m in ("dip", "sgld"):
                return losses.mse_loss(out[..., :1], self.target)
            return losses.gaussian_nll(out[..., :1], out[..., 1:], self.target)
        if t == "sr":
            out_lr = self.apply_operator(out)
            if m == "dip":
                return losses.mse_loss(out_lr[..., :1], self.target)
            return losses.gaussian_nll(out_lr[..., :1], out_lr[..., 1:],
                                       self.target)
        if t == "inp":
            # ALL four inp runners sigmoid the mean channels before the loss
            # (dip :2824, mfvi :3034, mcd :3249, sgld :3464 — mcd/sgld via
            # in-place out[:, :3].sigmoid_()); the logvar channel is never
            # sigmoided (need_sigmoid=False on the net, :2998)
            pred = jax.nn.sigmoid(out[..., :3])
            if m == "dip":
                return losses.mse_loss(pred * self.mask,
                                       self.target * self.mask)
            return losses.gaussian_nll_masked(pred, out[..., 3:], self.target,
                                              self.mask)
        raise ValueError(self.task)

    # -- post-loss output transform (feeds the EMA + metrics) ---------------
    def transform(self, out: jnp.ndarray) -> jnp.ndarray:
        t, m = self.task, self.method
        if t == "ct" or (t in ("den", "sr") and m == "dip"):
            return out
        if t in ("den", "sr"):
            return jnp.concatenate([out[..., :1], jnp.exp(-out[..., 1:])], -1)
        # inp: the runners' in-place sigmoid means the EMA/metrics see
        # sigmoided mean channels for every method (:2824,:3034,:3249,:3464)
        mean = jax.nn.sigmoid(out[..., :3])
        ale = out[..., 3:]
        if m != "dip":
            ale = jnp.exp(-ale)
        return jnp.concatenate([mean, ale], -1)

    # -- per-iteration metrics (parity with the runners' triples) -----------
    def metrics(self, out_t: jnp.ndarray, out_avg: jnp.ndarray):
        """Returns (mse_corrupted, mse_gt, psnr[3], ssim[3]) — an 8-vector.
        ``out_t`` is the transformed per-iteration output, ``out_avg`` the EMA.
        """
        from ..ops.metrics import psnr, ssim
        mc = self.mean_ch
        o = jnp.clip(out_t[..., :mc], 0, 1)
        oa = jnp.clip(out_avg[..., :mc], 0, 1)

        if self.task == "ct":
            mse_c = losses.mse_loss(out_avg[..., :1], self.gt)
            p0 = psnr(self.gt, o)
            row_p = jnp.stack([p0, p0, psnr(self.gt, oa)])
            s0 = ssim(self.gt, o)
            row_s = jnp.stack([s0, s0, ssim(self.gt, oa)])
            return jnp.concatenate([jnp.stack([mse_c, mse_c]), row_p, row_s])
        if self.task == "den":
            mse_c = losses.mse_loss(out_avg[..., :1], self.target)
            mse_g = losses.mse_loss(out_avg[..., :1], self.gt)
            row_p = jnp.stack([psnr(self.target, o), psnr(self.gt, o),
                               psnr(self.gt, oa)])
            row_s = jnp.stack([ssim(self.target, o), ssim(self.gt, o),
                               ssim(self.gt, oa)])
            return jnp.concatenate([jnp.stack([mse_c, mse_g]), row_p, row_s])
        if self.task == "sr":
            out_lr = jnp.clip(self.apply_operator(out_t)[..., :1], 0, 1)
            mse_c = losses.mse_loss(self.apply_operator(out_avg)[..., :1], self.target)
            mse_g = losses.mse_loss(out_avg[..., :1], self.gt)
            row_p = jnp.stack([psnr(self.target, out_lr), psnr(self.gt, o),
                               psnr(self.gt, oa)])
            row_s = jnp.stack([ssim(self.target, out_lr), ssim(self.gt, o),
                               ssim(self.gt, oa)])
            return jnp.concatenate([jnp.stack([mse_c, mse_g]), row_p, row_s])
        # inp
        mse_c = losses.mse_loss(out_avg[..., :3], self.gt)
        gm, om, oam = self.gt * self.mask, o * self.mask, oa * self.mask
        row_p = jnp.stack([psnr(self.gt, o), psnr(gm, om), psnr(gm, oam)])
        row_s = jnp.stack([ssim(self.gt, o), ssim(gm, om), ssim(gm, oam)])
        return jnp.concatenate([jnp.stack([mse_c, mse_c]), row_p, row_s])


_CT_THETA = np.arange(0.0, 180.0, 4.0)  # ref :545


def _standard_net(n_channels, method, dropout_p, input_depth=16):
    kwargs = {}
    if method == "mcd":
        kwargs = dict(dropout_mode_down="2d", dropout_p_down=dropout_p,
                      dropout_mode_up="2d", dropout_p_up=dropout_p)
    return build_skip_net(
        input_depth, n_channels=n_channels, pad="reflection",
        skip_n33d=[16, 32, 64, 128, 128], skip_n33u=[16, 32, 64, 128, 128],
        skip_n11=4, num_scales=5, upsample_mode="bilinear", **kwargs)


def build_problem(task: str, method: str, img: int, *, p_sigma: float = 0.1,
                  input_depth: int = 16, dropout_p: float = 0.3,
                  sr_factor: int = 4,
                  rng: np.random.Generator | None = None) -> Problem:
    """Load data, corrupt it, build the operator + net for (task, method)."""
    rng = rng or np.random.default_rng(42)

    if task == "den":
        img_np, _ = D.get_image_denoising(img)
        noisy_np = I.add_gaussian_noise(img_np, p_sigma, rng)
        gt = jnp.asarray(I.chw_to_nhwc(img_np))
        target = jnp.asarray(I.chw_to_nhwc(noisy_np))
        net = _standard_net(2, method, dropout_p, input_depth)
        return Problem(task, method, net, input_depth, img_np.shape[1:], 1,
                       gt, target, None, None, img_np, noisy_np,
                       has_ale=(method != "dip"))

    if task == "sr":
        img_np, _ = D.get_img_superresolution(img)
        gt = jnp.asarray(I.chw_to_nhwc(img_np))
        mode = "bilinear" if method == "dip" else "nearest"
        resize = (layers.resize_bilinear if mode == "bilinear"
                  else layers.resize_nearest)

        def operator(x, _f=1.0 / sr_factor):
            return resize(x, _f)

        target = operator(gt)
        net = _standard_net(2, method, dropout_p, input_depth)
        return Problem(task, method, net, input_depth, img_np.shape[1:], 1,
                       gt, target, None, operator, img_np,
                       np.asarray(I.nhwc_to_chw(np.asarray(target))),
                       sr_factor=sr_factor, has_ale=(method != "dip"),
                       init_normal_std=(0.1 if method == "mcd" else None))

    if task == "inp":
        img_np, mask_np, _ = D.get_img_inpainting(img)
        gt = jnp.asarray(I.chw_to_nhwc(img_np))
        mask = jnp.round(jnp.asarray(I.chw_to_nhwc(mask_np)))
        if method == "mcd":
            net = build_skip_net(
                input_depth, n_channels=4, pad="reflection",
                skip_n33d=[16, 32, 64, 128, 128],
                skip_n33u=[16, 32, 64, 128, 128], skip_n11=0, num_scales=5,
                upsample_mode="bilinear",
                dropout_mode_down="2d", dropout_p_down=dropout_p,
                dropout_mode_up="2d", dropout_p_up=dropout_p)
        else:
            net = SkipNet(
                num_input_channels=input_depth, num_output_channels=4,
                num_channels_down=[16, 32, 64, 128, 128, 128],
                num_channels_up=[16, 32, 64, 128, 128, 128],
                num_channels_skip=[0] * 6, filter_size_down=5,
                filter_size_up=3, filter_skip_size=1, need1x1_up=False,
                upsample_mode="nearest", pad="reflection", need_sigmoid=False)
        return Problem(task, method, net, input_depth, img_np.shape[1:], 3,
                       gt, gt, mask, None, img_np, mask_np,
                       has_ale=(method != "dip"))

    if task == "ct":
        img_np, _ = D.get_img_ct(img)
        gt = jnp.asarray(I.chw_to_nhwc(img_np))
        radon = FastRadonTransform(gt.shape, _CT_THETA)
        target = radon(gt)
        net = _standard_net(1, method, dropout_p, input_depth)
        if radon.mode in ("matmul", "pallas", "banded", "banded-bf16"):
            operator, op_state = radon.apply, radon.matrix()
        else:
            operator, op_state = radon, None
        return Problem(task, method, net, input_depth, img_np.shape[1:], 1,
                       gt, target, None, operator, img_np,
                       np.asarray(target)[0].transpose(2, 0, 1),
                       has_ale=False, op_state=op_state)

    raise ValueError(f"unknown task {task!r}")


def reinit_conv_weights_normal(params, key, std: float = 0.1):
    """sr_mcd quirk (ref :2379 net.apply(init_normal)): conv *weights*
    re-drawn from N(0, std); biases untouched."""
    counter = [0]

    def rec(node):
        if isinstance(node, dict) and "w" in node:
            k = jax.random.fold_in(key, counter[0])
            counter[0] += 1
            out = dict(node)
            out["w"] = init_lib.normal(k, node["w"].shape, 0.0, std,
                                       node["w"].dtype)
            return out
        if isinstance(node, dict):
            return {k2: rec(v) for k2, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v) for v in node)
        return node

    return rec(params)
