"""Gatys optimization-based style transfer engine (fully jitted).

Reference flow (``IST/model/engine/transfer_style.py:11-44`` +
``engine/utils.py:17-45``): preprocess content/style, clone content as the
optimization variable, compute detached Gram/content targets, then run 300
L-BFGS closure evaluations — each one a full VGG forward+backward driven from
Python. The coarse-to-fine pass (``engine/hr_transfer_style.py:11-33``)
re-preprocesses at high resolution, initializes from the upscaled LR result,
and optimizes 500 more iterations.

TPU-native design: target computation + the ENTIRE L-BFGS loop compile into a
single XLA program (``lax.scan`` over iterations — see ``ops/lbfgs.py``).
One host→device transfer per frame, one device→host for the result; zero
per-iteration Python. VGG convs run in the policy compute dtype (bf16 on the
MXU by default for speed; fp32 available for strict parity), loss and L-BFGS
math in fp32.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cistar_tpu.data.transforms import GatysImageTransform
from cistar_tpu.models import vgg as vgg_lib
from cistar_tpu.ops.gram import gram_matrix, gram_mse_loss
from cistar_tpu.ops.lbfgs import lbfgs_minimize


class GatysEngine:
    """Compiled Gatys style-transfer runner for a fixed config.

    One instance caches jitted executables per (H, W, max_iters) so a batch
    sweep over same-sized radar frames compiles once (the reference's outer
    loop over a directory, ``IST/main.py:186-238``).
    """

    def __init__(self, cfg, vgg_params, compute_dtype=jnp.bfloat16,
                 history_size: int = 100,   # torch.optim.LBFGS default history
                 history_dtype=jnp.float32):
        self.cfg = cfg
        self.vgg_params = vgg_params
        self.compute_dtype = compute_dtype
        self.history_size = history_size
        self.history_dtype = history_dtype
        self.style_layers: List[str] = list(cfg.LOSS.STYLE_LAYERS)
        self.content_layers: List[str] = list(cfg.LOSS.CONTENT_LAYERS)
        self.style_weights = [float(w) for w in cfg.LOSS.STYLE_WEIGHTS]
        self.content_weights = [float(w) for w in cfg.LOSS.CONTENT_WEIGHTS]
        self.transform = GatysImageTransform(cfg.DATA.IMG_SIZE, cfg.DATA.IMAGENET_MEAN)
        self._compiled = {}

    # -- jitted core ---------------------------------------------------------
    def _optimize_fn(self, max_iters: int):
        style_layers = tuple(self.style_layers)
        content_layers = tuple(self.content_layers)
        loss_layers = style_layers + content_layers
        weights = tuple(self.style_weights + self.content_weights)
        n_style = len(style_layers)
        cdt = self.compute_dtype
        hist = self.history_size
        hdt = self.history_dtype

        @jax.jit
        def run(vgg_params, content, style, init_image):
            style_feats = vgg_lib.extract_features(
                vgg_params, style, style_layers, compute_dtype=cdt)
            style_targets = [jax.lax.stop_gradient(gram_matrix(f)) for f in style_feats]
            content_targets = [
                jax.lax.stop_gradient(f.astype(jnp.float32))
                for f in vgg_lib.extract_features(
                    vgg_params, content, content_layers, compute_dtype=cdt)
            ]

            def loss_fn(img):
                outs = vgg_lib.extract_features(
                    vgg_params, img, loss_layers, compute_dtype=cdt,
                    frozen=True)
                total = jnp.float32(0)
                for a, out in enumerate(outs):
                    if a < n_style:
                        l = gram_mse_loss(out, style_targets[a])
                    else:
                        l = jnp.mean(jnp.square(
                            out.astype(jnp.float32) - content_targets[a - n_style]))
                    total = total + weights[a] * l
                return total

            return lbfgs_minimize(loss_fn, init_image, max_iters,
                                  lr=1.0, history_size=hist,
                                  history_dtype=hdt)

        return run

    def optimize_batch(self, contents: jnp.ndarray, styles: jnp.ndarray,
                       init_images: Optional[jnp.ndarray] = None,
                       max_iters: Optional[int] = None):
        """Batch of F independent Gatys optimizations in ONE compiled program.

        vmap over the frame axis: each frame keeps its own L-BFGS history and
        step sizes, so results are mathematically identical to F sequential
        :meth:`optimize` calls — but the VGG forward/backward work batches
        onto the MXU (the reference sweeps its directory one frame at a time,
        ``IST/main.py:186-238``). Inputs are (F, 1, H, W, 3).
        """
        max_iters = int(max_iters or self.cfg.LOSS.MAX_ITER)
        key = ("batch", contents.shape, max_iters)
        if key not in self._compiled:
            single = self._optimize_fn(max_iters)

            def run_one(c, s, i):
                return single(self.vgg_params, c, s, i)

            self._compiled[key] = jax.jit(jax.vmap(run_one))
        if init_images is None:
            init_images = contents
        return self._compiled[key](jnp.asarray(contents), jnp.asarray(styles),
                                   jnp.asarray(init_images))

    def optimize(self, content: jnp.ndarray, style: jnp.ndarray,
                 init_image: Optional[jnp.ndarray] = None,
                 max_iters: Optional[int] = None):
        """Run the L-BFGS style optimization on NHWC arrays. Returns (img, loss, losses)."""
        max_iters = int(max_iters or self.cfg.LOSS.MAX_ITER)
        key = (content.shape, max_iters)
        if key not in self._compiled:
            self._compiled[key] = self._optimize_fn(max_iters)
        if init_image is None:
            init_image = content
        return self._compiled[key](self.vgg_params, jnp.asarray(content),
                                   jnp.asarray(style), jnp.asarray(init_image))

    # -- PIL-level drivers (reference-parity entry points) -------------------
    def transfer_style(self, content_img, style_img, max_iters: Optional[int] = None):
        """Parity with ``do_transfer_style``: PIL in → stylized PIL out."""
        content = self.transform.preparation(content_img)
        style = self.transform.preparation(style_img)
        out, loss, _ = self.optimize(content, style, max_iters=max_iters)
        return self.transform.post_preparation(np.asarray(out))

    def transfer_style_batch(self, content_imgs, style_img,
                             max_iters: Optional[int] = None):
        """F PIL frames → F stylized PILs through ONE vmapped program.

        The directory sweep is the reference's actual use case
        (``IST/main.py:186-238``, one frame at a time); this batches the
        independent L-BFGS runs via :meth:`optimize_batch` so the VGG
        forward/backward work fills the MXU. Frames are grouped by
        preprocessed shape (one executable per shape); results are
        mathematically identical to per-frame :meth:`transfer_style` calls.
        """
        style = self.transform.preparation(style_img)
        preps = [self.transform.preparation(im) for im in content_imgs]
        outs: List = [None] * len(preps)
        groups = {}
        for idx, c in enumerate(preps):
            groups.setdefault(c.shape, []).append(idx)
        for shape, idxs in groups.items():
            contents = jnp.stack([jnp.asarray(preps[i]) for i in idxs])
            styles = jnp.broadcast_to(jnp.asarray(style),
                                      (len(idxs),) + style.shape)
            imgs, _, _ = self.optimize_batch(contents, styles,
                                             max_iters=max_iters)
            imgs = np.asarray(imgs)
            for j, i in enumerate(idxs):
                outs[i] = self.transform.post_preparation(imgs[j])
        return outs

    def hr_transfer_style(self, content_img, style_img, lr_result_img,
                          max_iters: Optional[int] = None):
        """Coarse-to-fine pass (parity with ``do_hr_transfer_style``).

        Re-preprocess content/style at ``HRDATA.IMG_SIZE``, initialize from the
        upscaled LR result, optimize ``HRLOSS.MAX_ITER`` more iterations.
        """
        hr_size = self.cfg.HRDATA.IMG_SIZE
        hr_transform = GatysImageTransform(hr_size, self.cfg.DATA.IMAGENET_MEAN)
        content = hr_transform.preparation(content_img)
        style = hr_transform.preparation(style_img)
        init = hr_transform.preparation(lr_result_img)
        max_iters = int(max_iters or self.cfg.HRLOSS.MAX_ITER)
        out, loss, _ = self.optimize(content, style, init_image=init,
                                     max_iters=max_iters)
        return hr_transform.post_preparation(np.asarray(out))

    # -- optimize_new variants (parity with engine/utils.py:47-102) ----------
    def optimize_single_target(self, content: jnp.ndarray, style: jnp.ndarray,
                               content_only: bool = False, style_only: bool = False,
                               opt: str = "LBFGS",
                               init_image: Optional[jnp.ndarray] = None,
                               adam_lr: float = 1e-3):
        """``optimize_new``: content-only / style-only objectives.

        Faithful to the exercised reference semantics including its quirks:
        the single-target loss is NEGATED (``utils.py:92``) and the loop
        ``break``s after ONE ``optimizer.step`` (``utils.py:101``) — i.e. up
        to 20 L-BFGS closure evals (torch ``max_iter`` default) or exactly one
        Adam step. Both objectives set requires parity flags rather than being
        "fixed"; callers wanting a true minimization should use
        :meth:`optimize`.
        """
        assert content_only ^ style_only, "choose exactly one single-target mode"
        cdt = self.compute_dtype
        if init_image is None:
            init_image = content
        if content_only:
            layers = tuple(self.content_layers)
            weights = tuple(self.content_weights)
            targets = [jax.lax.stop_gradient(f.astype(jnp.float32))
                       for f in vgg_lib.extract_features(
                           self.vgg_params, jnp.asarray(content), layers,
                           compute_dtype=cdt)]

            def term(out, tgt):
                return jnp.mean(jnp.square(out.astype(jnp.float32) - tgt))
        else:
            layers = tuple(self.style_layers)
            weights = tuple(self.style_weights)
            targets = [jax.lax.stop_gradient(gram_matrix(f))
                       for f in vgg_lib.extract_features(
                           self.vgg_params, jnp.asarray(style), layers,
                           compute_dtype=cdt)]
            term = gram_mse_loss

        def loss_fn(img):
            outs = vgg_lib.extract_features(self.vgg_params, img, layers,
                                            compute_dtype=cdt, frozen=True)
            total = jnp.float32(0)
            for w, o, t in zip(weights, outs, targets):
                total = total + w * term(o, t)
            return -total  # reference negates (utils.py:92)

        if opt == "LBFGS":
            x, loss, losses = jax.jit(
                lambda x0: lbfgs_minimize(loss_fn, x0, max_iters=20,
                                          history_size=self.history_size)
            )(jnp.asarray(init_image, jnp.float32))
            return x, loss
        # single Adam step (torch defaults lr=1e-3)
        g = jax.jit(jax.grad(loss_fn))(jnp.asarray(init_image, jnp.float32))
        x = init_image - adam_lr * jnp.sign(g)  # first Adam step == lr·sign(g)
        return x, loss_fn(jnp.asarray(x))

    # -- saliency (parity with engine/utils.py:104-161) ----------------------
    def saliency(self, image: jnp.ndarray, layers: Sequence[str],
                 weights: Sequence[float]) -> jnp.ndarray:
        """Gradient of the negated weighted sum of activations w.r.t. the image."""
        layers = tuple(layers)
        weights = tuple(float(w) for w in weights)

        def obj(img):
            outs = vgg_lib.extract_features(
                self.vgg_params, img, layers, compute_dtype=self.compute_dtype,
                frozen=True)
            return -sum(w * jnp.sum(o.astype(jnp.float32))
                        for w, o in zip(weights, outs))

        return jax.jit(jax.grad(obj))(jnp.asarray(image))
