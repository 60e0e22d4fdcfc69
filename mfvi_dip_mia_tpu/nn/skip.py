"""The DIP skip-connection encoder-decoder U-Net as pure init/apply functions.

Topology parity with the reference builder (models/skip.py:5-134,
models/__init__.py:4-27, models/common.py:100-135):

  level i (of n scales), input x with c_i channels:
    skip branch (if skip_ch[i] > 0):  conv1x1 -> BN -> act
    deeper:   conv(k_down, stride2) -> BN -> act
              conv(k_down)          -> BN -> act
              [ level i+1 ]                        (except at the deepest)
              upsample x2 (nearest|bilinear)
    join:     concat(skip, deeper)  (center-crop to min spatial size)
              BN(skip_ch + deeper_ch)
              conv(k_up) -> BN -> act
              [conv1x1 -> BN -> act]               (if need1x1_up)
  output:  conv1x1 -> [sigmoid]

Every conv site is pad(reflection|zero) -> conv -> [dropout] -> [pool]
(ref models/common.py:100-135; pool replaces stride for avg/max modes).
Dropout is MC-style: active whenever a PRNG key is supplied in training mode
(the reference never switches nets to eval()).

Variational (MFVI) and deterministic parameterizations share this single
apply: conv leaves are dispatched by their pytree keys at trace time (see
bayes/vi.py), so `to_mfvi(params)` is the whole "Bayesianization" step —
no module surgery, no wrapper classes.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from . import cf
from . import init as init_lib
from . import layers
from .var_conv import apply_conv_leaf, sample_rt_kernel


def _fused_block_enabled() -> bool:
    """Fused conv+BN+LeakyReLU Pallas block for eligible CF sites (see
    ops/pallas/fused_block.py). Toggle off with MFVI_DIP_FUSED_BLOCK=0 for
    A/B runs; read at trace time like the other kernel gates."""
    import os
    return os.environ.get("MFVI_DIP_FUSED_BLOCK", "1") != "0"


class _NHWCOps:
    """Channels-last op set (torch artifact parity at the boundaries)."""
    is_cf = False
    reflection_pad = staticmethod(layers.reflection_pad)
    apply_conv_leaf = staticmethod(apply_conv_leaf)
    dropout = staticmethod(layers.dropout)
    dropout2d = staticmethod(layers.dropout2d)
    avg_pool = staticmethod(layers.avg_pool)
    max_pool = staticmethod(layers.max_pool)
    batch_norm_train = staticmethod(layers.batch_norm_train)
    upsample2x = staticmethod(layers.upsample2x)
    concat_center_crop = staticmethod(layers.concat_center_crop)


class _CFOps:
    """Channels-first op set for high-res levels: (1, C, H, W) tensors keep
    W on lanes / H on sublanes — dense under either of XLA's layout-heuristic
    modes, where small-C NHWC activations degrade to 8x-padded
    channels-on-lanes tilings whenever a custom call is in the module
    (see nn/cf.py docstring; measured round 3)."""
    is_cf = True
    reflection_pad = staticmethod(cf.reflection_pad)
    apply_conv_leaf = staticmethod(cf.apply_conv_leaf_cf)
    dropout = staticmethod(cf.dropout)
    dropout2d = staticmethod(cf.dropout2d)
    avg_pool = staticmethod(cf.avg_pool)
    max_pool = staticmethod(cf.max_pool)
    batch_norm_train = staticmethod(cf.batch_norm_train)
    upsample2x = staticmethod(cf.upsample2x)
    concat_center_crop = staticmethod(cf.concat_center_crop)


# levels whose input spatial extent is at least this run channels-first in
# layout='auto' mode (below it, channel counts reach >=64 and channels-on-
# lanes tilings are dense anyway, while W shrinks under a lane tile)
import os as _os

# 0 = every level runs channels-first under layout='auto'. The original
# hypothesis (levels with >=64 channels are dense under channels-on-lanes
# tilings anyway, so only high-res levels need CF) measured WRONG end-to-end:
# CT/MFVI 256^2 on v5e is 284.4 it/s all-CF vs 276.3 (CF >= 64) vs 268.3
# (CF >= 128) — the low-res NHWC levels still pay transpose/relayout copies
# at the CF<->NHWC boundaries. Env override for A/B: MFVI_DIP_CF_MIN.
CF_MIN_SIZE = int(_os.environ.get("MFVI_DIP_CF_MIN", "0"))


@dataclasses.dataclass(frozen=True)
class ConvSite:
    """Static description of one conv site (used for init, rng and apply)."""
    site_id: int
    c_in: int
    c_out: int
    kernel: int
    stride: int = 1
    pad_mode: str = "zero"            # 'zero' | 'reflection'
    bias: bool = True
    dropout_mode: str = "None"        # 'None' | '1d' | '2d'
    dropout_p: float = 0.5
    downsample_mode: str = "stride"   # 'stride' | 'avg' | 'max'


def _as_list(v, n):
    if isinstance(v, (list, tuple)):
        assert len(v) == n
        return list(v)
    return [v] * n


@dataclasses.dataclass(frozen=True)
class _LevelCfg:
    skip_conv: ConvSite | None
    down1: ConvSite
    down2: ConvSite
    up: ConvSite
    up1x1: ConvSite | None
    bn_cat_ch: int
    upsample_mode: str


class SkipNet:
    """Static network description with ``init(key)`` and ``apply(params, x)``.

    The object itself holds no arrays — it is safe to close over in jit.
    """

    def __init__(
        self,
        num_input_channels: int = 2,
        num_output_channels: int = 3,
        num_channels_down: Sequence[int] = (16, 32, 64, 128, 128),
        num_channels_up: Sequence[int] = (16, 32, 64, 128, 128),
        num_channels_skip: Sequence[int] = (4, 4, 4, 4, 4),
        filter_size_down=3,
        filter_size_up=3,
        filter_skip_size: int = 1,
        need_sigmoid: bool = True,
        need_bias: bool = True,
        pad: str = "zero",
        upsample_mode="nearest",
        downsample_mode="stride",
        act_fun: str = "LeakyReLU",
        need1x1_up: bool = True,
        dropout_mode_down: str = "None", dropout_p_down: float = 0.5,
        dropout_mode_up: str = "None", dropout_p_up: float = 0.5,
        dropout_mode_skip: str = "None", dropout_p_skip: float = 0.5,
        dropout_mode_output: str = "None", dropout_p_output: float = 0.5,
    ):
        n = len(num_channels_down)
        assert len(num_channels_up) == len(num_channels_skip) == n
        self.n_scales = n
        self.act = layers.activation(act_fun)
        self.act_name = act_fun
        self.need_sigmoid = need_sigmoid

        up_modes = _as_list(upsample_mode, n)
        down_modes = _as_list(downsample_mode, n)
        k_down = _as_list(filter_size_down, n)
        k_up = _as_list(filter_size_up, n)

        sid = [0]

        def site(c_in, c_out, k, stride=1, dmode="None", dp=0.5,
                 ds_mode="stride") -> ConvSite:
            s = ConvSite(
                site_id=sid[0], c_in=c_in, c_out=c_out, kernel=k,
                stride=stride, pad_mode=pad, bias=need_bias,
                dropout_mode=dmode, dropout_p=dp, downsample_mode=ds_mode)
            sid[0] += 1
            return s

        levels = []
        c_in = num_input_channels
        for i in range(n):
            last = i == n - 1
            deeper_out = num_channels_down[i] if last else num_channels_up[i + 1]
            skip_conv = None
            if num_channels_skip[i] != 0:
                skip_conv = site(c_in, num_channels_skip[i], filter_skip_size,
                                 1, dropout_mode_skip, dropout_p_skip)
            down1 = site(c_in, num_channels_down[i], k_down[i], 2,
                         dropout_mode_down, dropout_p_down, down_modes[i])
            down2 = site(num_channels_down[i], num_channels_down[i], k_down[i],
                         1, dropout_mode_down, dropout_p_down)
            up = site(num_channels_skip[i] + deeper_out, num_channels_up[i],
                      k_up[i], 1, dropout_mode_up, dropout_p_up)
            up1x1 = None
            if need1x1_up:
                up1x1 = site(num_channels_up[i], num_channels_up[i], 1, 1,
                             dropout_mode_up, dropout_p_up)
            levels.append(_LevelCfg(
                skip_conv=skip_conv, down1=down1, down2=down2, up=up,
                up1x1=up1x1,
                bn_cat_ch=num_channels_skip[i] + deeper_out,
                upsample_mode=up_modes[i]))
            c_in = num_channels_down[i]

        self.levels = levels
        self.out_conv = site(num_channels_up[0], num_output_channels, 1, 1,
                             dropout_mode_output, dropout_p_output)
        self.num_conv_sites = sid[0]

    def structure_key(self):
        """Hashable full-structure key: nets with equal keys have identical
        ``init``/``apply`` behavior (both are pure functions of params and
        the frozen site/level configs). Lets executable caches be shared
        across instances — BO fanout builds a fresh net per candidate, and
        without structural sharing every fanout thread would re-deserialize
        (= re-run LLVM codegen for) the same XLA executable."""
        return (tuple(self.levels), self.out_conv, self.act_name,
                self.need_sigmoid)

    # -- init ---------------------------------------------------------------

    def _init_conv(self, key, s: ConvSite):
        kw, kb = jax.random.split(key)
        leaf = {"w": init_lib.conv_kernel_torch_default(
            kw, s.kernel, s.kernel, s.c_in, s.c_out)}
        if s.bias:
            leaf["b"] = init_lib.conv_bias_torch_default(
                kb, s.c_out, s.c_in * s.kernel * s.kernel)
        else:
            leaf["b"] = None
        return leaf

    @staticmethod
    def _init_bn(c):
        return {"scale": jnp.ones((c,), jnp.float32),
                "offset": jnp.zeros((c,), jnp.float32)}

    def init(self, key):
        keys = jax.random.split(key, self.num_conv_sites + 1)

        def conv_bn(s: ConvSite):
            return {"conv": self._init_conv(keys[s.site_id], s),
                    "bn": self._init_bn(s.c_out)}

        levels = []
        for cfg in self.levels:
            lv = {
                "skip": conv_bn(cfg.skip_conv) if cfg.skip_conv else None,
                "down1": conv_bn(cfg.down1),
                "down2": conv_bn(cfg.down2),
                "bn_cat": self._init_bn(cfg.bn_cat_ch),
                "up": conv_bn(cfg.up),
                "up1x1": conv_bn(cfg.up1x1) if cfg.up1x1 else None,
            }
            levels.append(lv)
        return {
            "levels": levels,
            "out": {"conv": self._init_conv(keys[self.out_conv.site_id],
                                            self.out_conv)},
        }

    # -- apply --------------------------------------------------------------

    def _conv_site(self, s: ConvSite, leaf, x, key, training, reparam,
                   dropout_p=None, skip_bias=False, ops=_NHWCOps):
        to_pad = (s.kernel - 1) // 2
        pad_kw = {}
        if s.pad_mode == "reflection":
            if ops.is_cf and to_pad:
                # CF path: delegate the reflect pad to the conv so the
                # pallas kernel merges it with its alignment pad into ONE
                # materialization (ops/pallas/cf_conv.py::conv_pad_cf)
                pad_kw = {"pad_mode": "reflection"}
            else:
                x = ops.reflection_pad(x, to_pad)
                to_pad = 0
        stride, pool = s.stride, None
        if s.stride != 1 and s.downsample_mode != "stride":
            stride, pool = 1, s.downsample_mode
            if s.downsample_mode in ("lanczos2", "lanczos3"):
                # fixed anti-aliased downsampler after the conv
                # (ref models/common.py:109-111); NHWC-only — CF sites wrap
                # it with transposes (rare: lanczos is an opt-in mode)
                from ..ops.downsampler import Downsampler
                pool = Downsampler(s.c_out, s.stride, s.downsample_mode,
                                   phase=0.5, preserve_size=True)
        site_key = (jax.random.fold_in(key, s.site_id)
                    if key is not None else None)
        out = ops.apply_conv_leaf(leaf, x, stride=stride, padding=to_pad,
                                  key=site_key, training=training,
                                  reparam=reparam, skip_bias=skip_bias,
                                  **pad_kw)
        if s.dropout_mode != "None" and training:
            if site_key is None:
                raise ValueError("dropout needs a PRNG key")
            dkey = jax.random.fold_in(site_key, 0x5eed)
            # dropout_p may be a traced scalar override (keeps BO sweeps over
            # dropout rates on one compiled graph)
            p = s.dropout_p if dropout_p is None else dropout_p
            if s.dropout_mode == "2d":
                out = ops.dropout2d(out, p, dkey)
            else:
                out = ops.dropout(out, p, dkey)
        if pool == "avg":
            out = ops.avg_pool(out, s.stride)
        elif pool == "max":
            out = ops.max_pool(out, s.stride)
        elif callable(pool):
            if ops.is_cf:
                out = cf.to_cf(pool(cf.from_cf(out)))
            else:
                out = pool(out)
        return out

    def _conv_bn_act(self, s: ConvSite, p, x, key, training, reparam,
                     dropout_p=None, ops=_NHWCOps):
        # The conv bias is a per-channel constant that the train-mode BN's
        # mean subtraction removes EXACTLY (see apply_conv_leaf), so skip the
        # add and its (analytically zero, but full-map-reduction) gradient —
        # unless something nonlinear/noisy sits between conv and BN: dropout
        # (multiplicative per-element), a Lanczos pool (callable), or LRT
        # (bias variance feeds per-pixel noise).
        skip_bias = (s.dropout_mode == "None" and reparam != "lrt"
                     and (s.stride == 1
                          or s.downsample_mode in ("stride", "avg", "max")))
        # Eligible CF sites run the whole conv->BN->LeakyReLU chain as one
        # VMEM-resident Pallas block (ops/pallas/fused_block.py): the weight
        # is materialized first (sample_rt_kernel keeps the PRNG stream
        # identical), so RT/deterministic sites fuse; LRT cannot (activation-
        # space noise between conv and BN).
        if (ops.is_cf and skip_bias and s.stride == 1
                and self.act_name == "LeakyReLU" and _fused_block_enabled()):
            from ..ops.pallas import fused_block as fb
            leaf = p["conv"]
            site_key = (jax.random.fold_in(key, s.site_id)
                        if key is not None else None)
            w = sample_rt_kernel(leaf, site_key, training)
            out = fb.apply_fused(x, w, p["bn"]["scale"], p["bn"]["offset"],
                                 pad_mode=s.pad_mode, slope=0.2)
            if out is not None:
                return out
        x = self._conv_site(s, p["conv"], x, key, training, reparam, dropout_p,
                            skip_bias=skip_bias, ops=ops)
        x = ops.batch_norm_train(x, p["bn"]["scale"], p["bn"]["offset"])
        return self.act(x)

    def _use_cf(self, layout: str, x_nhwc) -> bool:
        return (layout == "auto"
                and min(x_nhwc.shape[1], x_nhwc.shape[2]) >= CF_MIN_SIZE)

    def _apply_level(self, params, i, x, key, training, reparam, dropout_p,
                     layout="nhwc"):
        cfg = self.levels[i]
        lv = params["levels"][i]

        # layout decision is static (shapes are): high-res levels run NCHW;
        # adjacent to_cf/from_cf transposes between consecutive CF levels
        # cancel in XLA's algebraic simplifier, so converting at every level
        # boundary costs nothing in the compiled program.
        use_cf = self._use_cf(layout, x)
        ops = _CFOps if use_cf else _NHWCOps
        if use_cf:
            x = cf.to_cf(x)

        h = self._conv_bn_act(cfg.down1, lv["down1"], x, key, training,
                              reparam, dropout_p, ops)
        h = self._conv_bn_act(cfg.down2, lv["down2"], h, key, training,
                              reparam, dropout_p, ops)
        if i < self.n_scales - 1:
            h_nhwc = cf.from_cf(h) if use_cf else h
            h_nhwc = self._apply_level(params, i + 1, h_nhwc, key, training,
                                       reparam, dropout_p, layout)
            h = cf.to_cf(h_nhwc) if use_cf else h_nhwc
        h = ops.upsample2x(h, cfg.upsample_mode)

        if cfg.skip_conv is not None:
            s = self._conv_bn_act(cfg.skip_conv, lv["skip"], x, key, training,
                                  reparam, dropout_p, ops)
            z = ops.concat_center_crop([s, h])
        else:
            z = h
        z = ops.batch_norm_train(z, lv["bn_cat"]["scale"],
                                 lv["bn_cat"]["offset"])
        z = self._conv_bn_act(cfg.up, lv["up"], z, key, training, reparam,
                              dropout_p, ops)
        if cfg.up1x1 is not None:
            z = self._conv_bn_act(cfg.up1x1, lv["up1x1"], z, key, training,
                                  reparam, dropout_p, ops)
        return cf.from_cf(z) if use_cf else z

    def apply(self, params, x, key=None, training: bool = True,
              reparam: str = "rt", dropout_p=None, layout: str = "nhwc"):
        """Forward pass. ``x``: NHWC (both layouts; 'auto' only changes the
        internal compute layout). ``key`` drives weight sampling (MFVI) and
        dropout; pass None for a purely deterministic forward. ``dropout_p``
        (optionally traced) overrides every site's rate. ``layout='auto'``
        runs levels with spatial extent >= CF_MIN_SIZE channels-first
        (numerically identical modulo float summation order; same PRNG
        stream)."""
        z = self._apply_level(params, 0, x, key, training, reparam, dropout_p,
                              layout)
        s = self.out_conv
        use_cf = self._use_cf(layout, z)
        if use_cf:
            z = cf.to_cf(z)
        z = self._conv_site(s, params["out"]["conv"], z, key, training,
                            reparam, dropout_p,
                            ops=_CFOps if use_cf else _NHWCOps)
        if use_cf:
            z = cf.from_cf(z)
        if self.need_sigmoid:
            z = jax.nn.sigmoid(z)
        return z


def build_skip_net(input_depth: int, n_channels: int = 3, pad: str = "zero",
                   upsample_mode="nearest", act_fun: str = "LeakyReLU",
                   need_sigmoid: bool = False, skip_n33d=128, skip_n33u=128,
                   skip_n11=4, num_scales: int = 5, downsample_mode="stride",
                   **dropout_kwargs) -> SkipNet:
    """get_net() parity constructor (ref models/__init__.py:4-27)."""
    return SkipNet(
        num_input_channels=input_depth,
        num_output_channels=n_channels,
        num_channels_down=(
            [skip_n33d] * num_scales if isinstance(skip_n33d, int) else skip_n33d),
        num_channels_up=(
            [skip_n33u] * num_scales if isinstance(skip_n33u, int) else skip_n33u),
        num_channels_skip=(
            [skip_n11] * num_scales if isinstance(skip_n11, int) else skip_n11),
        upsample_mode=upsample_mode, downsample_mode=downsample_mode,
        need_sigmoid=need_sigmoid, need_bias=True, pad=pad, act_fun=act_fun,
        **dropout_kwargs)
