"""Training-trajectory parity against the reference torch stack.

Forward-loss parity (test_parity_data) can't catch optimizer-side
divergences: warmup off-by-ones, decay-mask mismatches, eps/decay placement,
EMA drift. These tests run the ACTUAL reference optimizer code
(libs/utils/train_utils.py:65-213, libs/utils/lr_schedulers.py:10-211) side
by side with our optax pipeline:

- schedule tests: lr sequence of the reference schedulers (stepped per
  iteration exactly like train_one_epoch) vs our make_schedule closed forms.
- decay-mask test: one zero-gradient AdamW step isolates weight decay — a
  param moves iff it is in the decay set, so converted-params equality after
  the step proves the mask matches the reference's minGPT split param-by-param.
- trajectory test: K=50 real train steps (converted init, same fixed batch
  sequence, droppath/dropout off) through reference AdamW + per-iteration
  LinearWarmupCosineAnnealingLR + grad-clip + ModelEma(0.999) vs our fused
  train step; asserts per-step loss agreement and final param/EMA closeness
  relative to how far the params actually moved.
"""

import importlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.models import ArchConfig, AVLocalizer
from audio_visual_deepfake_detection_tpu.tools.convert_torch import convert_state_dict
from audio_visual_deepfake_detection_tpu.train.optim import (
    decay_mask, make_optimizer, make_schedule)
from reference_oracle import load_reference_modeling, reference_model_kwargs


def _load_ref_train_utils():
    load_reference_modeling()  # sets sys.path + stubs nms_1d_cpu/torchsort
    return importlib.import_module("libs.utils.train_utils")


def _torch_lr_sequence(sched_factory, n_steps):
    """lr actually used at iterations 0..n_steps-1 when the scheduler is
    stepped per iteration AFTER each optimizer.step (train_utils.py:311-313)."""
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)  # base_lr is injected by the factory
    sched = sched_factory(opt)
    lrs = []
    for _ in range(n_steps):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.asarray(lrs)


@pytest.mark.parametrize("warmup_epochs,epochs,iters", [(2, 3, 10), (1, 4, 7)])
def test_schedule_cosine_matches_reference(warmup_epochs, epochs, iters):
    tu = _load_ref_train_utils()
    opt_cfg = {"learning_rate": 1e-3, "warmup": True, "schedule_type": "cosine",
               "warmup_epochs": warmup_epochs, "epochs": epochs}

    def factory(opt):
        opt.param_groups[0]["lr"] = opt_cfg["learning_rate"]
        opt.param_groups[0]["initial_lr"] = opt_cfg["learning_rate"]
        return tu.make_scheduler(opt, opt_cfg, iters)

    n = (warmup_epochs + epochs) * iters
    ref_lrs = _torch_lr_sequence(factory, n)
    ours = make_schedule(opt_cfg, iters)
    our_lrs = np.asarray([float(ours(i)) for i in range(n)])
    # the reference steps the CHAINABLE recursion; our closed form matches it
    # to fp accumulation error
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-5, atol=1e-12)
    # warmup boundary exactness: base lr is reached at step W-1 and held at W
    W = warmup_epochs * iters
    assert abs(our_lrs[W - 1] - opt_cfg["learning_rate"]) < 1e-9
    assert abs(our_lrs[W] - opt_cfg["learning_rate"]) < 1e-9


def test_schedule_multistep_matches_reference():
    tu = _load_ref_train_utils()
    iters = 6
    opt_cfg = {"learning_rate": 2e-3, "warmup": True,
               "schedule_type": "multistep", "warmup_epochs": 2, "epochs": 8,
               "schedule_steps": [2, 5], "schedule_gamma": 0.3}

    def factory(opt):
        opt.param_groups[0]["lr"] = opt_cfg["learning_rate"]
        opt.param_groups[0]["initial_lr"] = opt_cfg["learning_rate"]
        return tu.make_scheduler(opt, opt_cfg, iters)

    n = (opt_cfg["warmup_epochs"] + opt_cfg["epochs"]) * iters
    ref_lrs = _torch_lr_sequence(factory, n)
    ours = make_schedule(opt_cfg, iters)
    our_lrs = np.asarray([float(ours(i)) for i in range(n)])
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-6, atol=1e-12)


@pytest.fixture(scope="module")
def train_pair():
    """(ref model, our cfg, converted params) with droppath/dropout off so
    both trajectories are deterministic."""
    modeling = load_reference_modeling()
    # keep the reference's droppath=0.1 so the AffineDropPath layer-scales
    # EXIST (droppath=0 builds nn.Identity, blocks.py:1304-1305); eval() mode
    # disables the stochastic drop while keeping the scale multiply — which
    # matches our model at cfg.droppath=0.0 (scale always applied)
    kwargs = reference_model_kwargs(max_seq_len=192)
    torch.manual_seed(5)
    ref = modeling.make_meta_arch(
        "AVLocPointTransformerRecoveryNoNormNorecon", **kwargs)
    ref.eval()  # no dropout/droppath; InstanceNorm has no running stats

    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=64, num_classes=1,
        max_seq_len=192, embd_dim=32, fpn_dim=32, head_dim=32, n_head=4,
        mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=True, droppath=0.0,
        dropout=0.0,
    )
    ours = AVLocalizer(cfg)
    template = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 64)),
                         jnp.ones((1, 192), bool), train=False)
    params = {"params": convert_state_dict(ref.state_dict(), template["params"])}
    return ref, cfg, params


def _tree_l2(tree):
    return float(jnp.sqrt(sum(jnp.sum(jnp.square(x))
                              for x in jax.tree_util.tree_leaves(tree))))


def test_decay_mask_matches_reference(train_pair):
    """One AdamW step with ZERO gradients: the Adam term is 0/(0+eps)=0, so a
    param changes iff weight decay applies to it. Converted-params equality
    after the step verifies our 'kernel' mask against the reference's minGPT
    decay/no-decay split (train_utils.py:71-122) param-by-param."""
    import copy

    import optax
    from flax import traverse_util

    tu = _load_ref_train_utils()
    ref, cfg, params = train_pair
    ref = copy.deepcopy(ref)

    lr, wd = 0.1, 0.5  # large so any mask mismatch is far above tolerance
    opt = tu.make_optimizer(ref, {"type": "AdamW", "learning_rate": lr,
                                  "weight_decay": wd, "momentum": 0.9})
    # grads for exactly the params real training touches: the last
    # hh_branch's output is discarded (backbones.py:485-492), so its params
    # keep grad=None and torch AdamW skips them entirely (decay included)
    n_hh = len(ref.backbone.hh_branch)
    dead_prefix = f"backbone.hh_branch.{n_hh - 1}."
    for name, p in ref.named_parameters():
        if not name.startswith(dead_prefix):
            p.grad = torch.zeros_like(p)
    opt.step()

    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd,
                     mask=decay_mask(params))
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, tx.init(params), params)
    stepped = optax.apply_updates(params, updates)

    expected = {"params": convert_state_dict(
        ref.state_dict(), stepped["params"])}
    got = traverse_util.flatten_dict(stepped["params"])
    want = traverse_util.flatten_dict(expected["params"])
    for path in want:
        np.testing.assert_allclose(
            np.asarray(got[path]), np.asarray(want[path]), rtol=1e-6,
            atol=1e-8, err_msg="decay-mask mismatch at " + "/".join(path))


def _ref_train_losses(ref, x_t, mask_t, gt_segments, gt_labels,
                      gt_video_labels, valid_idx):
    """Reference train-branch forward (av_fd_no_recon.py:334-415) without the
    list-of-dicts plumbing, WITH grads."""
    norm_inputs, _, cls_scores = ref.interpolator(x_t, mask_t)
    bfeats, bmasks = ref.backbone(x_t, norm_inputs, x_t, mask_t)
    fpn_feats, fpn_masks = ref.neck(bfeats, bmasks)
    points = ref.point_generator(fpn_feats)
    out_cls = [t.permute(0, 2, 1) for t in ref.cls_head(fpn_feats, fpn_masks)]
    out_off = [t.permute(0, 2, 1) for t in ref.reg_head(fpn_feats, fpn_masks)]
    fpn_masks_sq = [m.squeeze(1) for m in fpn_masks]
    gt_cls_t, gt_off_t = ref.label_points(points, gt_segments, gt_labels)
    return ref.losses(fpn_masks_sq, out_cls, out_off, norm_inputs, None,
                      cls_scores, gt_cls_t, gt_off_t, gt_video_labels,
                      vaild_idx=valid_idx)


@pytest.mark.slow
@pytest.mark.parametrize("schedule", ["cosine", "multistep"])
def test_train_trajectory_parity(train_pair, schedule):
    """K steps of reference AdamW + per-iteration scheduler + grad-clip + EMA
    vs our fused train step, from converted init over the same fixed batches.
    The cosine run covers its warmup boundary (W=10) and the multistep run
    its two post-warmup decays.

    What is asserted, and why at different horizons: per-step LOSS agreement
    holds across the whole run, but cross-framework f32 PARAM parity is
    chaotic past ~15 steps — the interpolator's video-cls head max-pools over
    time (blocks.py:1608-1618), and ~1e-7 forward differences flip the argmax,
    rerouting that head's gradient to different coordinates. The loss is
    continuous in the max VALUE, so it keeps matching while per-coordinate
    params drift (measured: rel divergence 1.7e-4 @ step 5 -> 0.03 @ 20 ->
    0.18 @ 50, concentrated in interpolator/down_*). So: strict param/EMA
    parity at step 12 (pre-chaos, past the cosine warmup boundary), and a
    gross-error bound at the end (a wrong lr scale / decay placement measures
    O(1))."""
    import copy

    from audio_visual_deepfake_detection_tpu.train import (
        TrainState, build_train_step)

    tu = _load_ref_train_utils()
    ref, cfg, params0 = train_pair
    ref = copy.deepcopy(ref)
    K, B, T, C = 50, 2, 192, 64
    CHECK_AT = 12  # strict param-parity horizon (pre-chaos)
    iters_per_epoch = 5
    if schedule == "cosine":
        opt_cfg = {"type": "AdamW", "learning_rate": 1e-3,
                   "weight_decay": 0.05, "momentum": 0.9, "warmup": True,
                   "schedule_type": "cosine", "warmup_epochs": 2, "epochs": 8}
    else:
        K = 25  # decays at steps 5 (W) + 5 and 5 + 15 are both inside
        opt_cfg = {"type": "AdamW", "learning_rate": 1e-3,
                   "weight_decay": 0.05, "momentum": 0.9, "warmup": True,
                   "schedule_type": "multistep", "warmup_epochs": 1,
                   "epochs": 4, "schedule_steps": [1, 3],
                   "schedule_gamma": 0.3}
    train_cfg = {"loss_weight": 2.0, "label_smoothing": 0.1,
                 "center_sample": "radius", "center_sample_radius": 1.5,
                 "init_loss_norm": 100}

    # fixed batch sequence; sample 0 has one fake segment, sample 1 is real
    rng = np.random.default_rng(13)
    batches = []
    for _ in range(K):
        x = rng.standard_normal((B, T, C)).astype(np.float32)
        s0 = float(rng.uniform(5, 40))
        seg = np.asarray([[s0, s0 + float(rng.uniform(5, 30))]], np.float32)
        batches.append((x, seg))

    # ---- reference: the actual train_one_epoch inner loop
    # (train_utils.py:296-316)
    ref.loss_normalizer = train_cfg["init_loss_norm"]
    opt = tu.make_optimizer(ref, opt_cfg)
    sched = tu.make_scheduler(opt, opt_cfg, iters_per_epoch)
    ema = tu.ModelEma(ref)
    ref_losses_per_step = []
    ref_snap = {}
    mask_t = torch.ones(B, 1, T, dtype=torch.bool)
    for i, (x, seg) in enumerate(batches):
        opt.zero_grad()
        losses = _ref_train_losses(
            ref, torch.from_numpy(x).permute(0, 2, 1), mask_t,
            [torch.from_numpy(seg)], [torch.zeros(1, dtype=torch.long)],
            [torch.ones(1), torch.zeros(1)], valid_idx=[0])
        losses["final_loss"].backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.0)
        opt.step()
        sched.step()
        ema.update(ref)
        ref_losses_per_step.append(float(losses["final_loss"]))
        if i + 1 == CHECK_AT:
            ref_snap["params"] = copy.deepcopy(ref.state_dict())
            ref_snap["ema"] = copy.deepcopy(ema.module.state_dict())

    # ---- ours: the fused train step over the same batches
    tx, _ = make_optimizer(params0, opt_cfg, iters_per_epoch,
                           clip_grad_l2norm=1.0)
    state = TrainState.create(params0, tx, train_cfg["init_loss_norm"],
                              jax.random.PRNGKey(0))
    # deterministic_forward: the reference's interpolator head has a
    # Dropout(0.5) (blocks.py:1615) whose torch RNG we cannot reproduce;
    # both sides run it disabled (ref is in eval())
    step_fn = jax.jit(build_train_step(cfg, train_cfg,
                                       deterministic_forward=True))
    our_losses = []
    our_snap = {}
    for i, (x, seg) in enumerate(batches):
        batch = {
            "feats": jnp.asarray(x),
            "mask": jnp.ones((B, T), bool),
            "gt_segments": jnp.asarray(
                np.stack([seg, np.zeros_like(seg)])),
            "gt_labels": jnp.zeros((B, 1), jnp.int32),
            "gt_valid": jnp.asarray([[True], [False]]),
            "has_gt": jnp.asarray([True, False]),
        }
        state, losses = step_fn(state, batch)
        our_losses.append(float(losses["final_loss"]))
        if i + 1 == CHECK_AT:
            our_snap["params"] = jax.tree_util.tree_map(np.asarray,
                                                        state.params)
            our_snap["ema"] = jax.tree_util.tree_map(np.asarray,
                                                     state.ema_params)

    # per-step loss agreement across the WHOLE run (drift grows with steps)
    for i, (a, b) in enumerate(zip(our_losses, ref_losses_per_step)):
        tol = 2e-3 * (1.0 + i / 10.0)
        assert abs(a - b) <= tol * max(abs(b), 1e-3), (
            f"step {i}: ours={a} ref={b}")

    def rel_div(ours_tree, ref_sd):
        ref_tree = {"params": convert_state_dict(
            ref_sd, state.params["params"])}
        diff = jax.tree_util.tree_map(lambda a, b: a - b, ours_tree, ref_tree)
        moved = jax.tree_util.tree_map(lambda a, b: a - b, ref_tree, params0)
        assert _tree_l2(moved) > 0.02, "training barely moved — vacuous test"
        return _tree_l2(diff) / _tree_l2(moved)

    # strict param/EMA parity at the pre-chaos horizon (measured: ~7e-3 of
    # pure fp chaos by step 12; a warmup off-by-one or decay-placement bug
    # measures >= 8e-2 here)
    rel = rel_div(our_snap["params"], ref_snap["params"])
    assert rel < 2.5e-2, f"param divergence @ step {CHECK_AT}: {rel}"
    erel = rel_div(our_snap["ema"], ref_snap["ema"])
    assert erel < 2.5e-2, f"EMA divergence @ step {CHECK_AT}: {erel}"

    # gross-error bound at the end: fp chaos measures ~0.18 (docstring); a
    # schedule/decay/EMA bug measures O(1)
    rel_end = rel_div(state.params, ref.state_dict())
    assert rel_end < 0.3, f"param divergence @ step {K}: {rel_end}"
    erel_end = rel_div(state.ema_params, ema.module.state_dict())
    assert erel_end < 0.3, f"EMA divergence @ step {K}: {erel_end}"
