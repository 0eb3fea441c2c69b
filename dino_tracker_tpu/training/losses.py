"""Loss terms and fixed-shape sampling helpers.

All losses are pure functions designed to live inside ONE jitted train step.
The reference's data-dependent control flow (variable best-buddy counts,
skip-empty-pair branches, retry loops) becomes masked fixed-shape arithmetic:
every candidate set is padded to a static size and carries a validity mask,
and "skip" is a zero weight. Behavior spec: reference dino_tracker.py:136-353.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.sampling import grid_sample_2d

EPS = 1e-8


def huber(pred, target, delta: float = 1.0 / 32.0):
    """torch.nn.HuberLoss(reduction='none') semantics."""
    d = pred - target
    abs_d = jnp.abs(d)
    quad = 0.5 * d * d
    lin = delta * (abs_d - 0.5 * delta)
    return jnp.where(abs_d <= delta, quad, lin)


def masked_gumbel_topk(key, mask, k: int):
    """Uniformly sample up to ``k`` distinct indices where ``mask`` is true.

    Equivalent to torch ``randperm(count)[:k]`` over the masked subset
    (Gumbel top-k over a flat mask). Returns (indices [k], valid [k]):
    indices are in ASCENDING index order (not score order) with invalid
    slots zero-filled, and ``valid[i]`` is False for slots beyond the
    masked population size — callers must treat the result as a set and
    mask invalid slots.
    When the candidate array itself is smaller than ``k`` (tiny-scale
    configs where the BB capacity < points-per-pair), the surplus slots
    are returned as invalid.

    ``lax.top_k`` is an iterative partial sort on TPU — at the cycle loss's
    shape (k~128 of h*w=406k, 8 calls per train step) it dominated the
    loss's forward. The selected *set* is all callers consume (every use
    sums over it), so the radix-select membership mask + one-hot compaction
    (ops/select.py) computes it with vector ops only; indices come out
    ascending instead of score-ordered.
    """
    from ..ops.select import compact_mask, topk_mask
    n = mask.shape[0]
    scores = jax.random.gumbel(key, (n,)) + jnp.where(mask, 0.0, -jnp.inf)
    # & mask: when fewer than k candidates exist, topk_mask fills its quota
    # with -inf (unmasked) slots — drop them; compact_mask's valid covers it
    sel = topk_mask(scores, min(k, n)) & mask
    idx, _, valid = compact_mask(sel, scores, k)
    return idx, valid


def sample_fg_mask_at_points(fg_mask_hw, coords_xy, resw: int, resh: int):
    """Foreground lookup at pixel coords, exactly mirroring the reference's
    ``filter_bb_foreground_pairs`` (models/utils.py:53-58): grid_sample with
    default align_corners=False / zeros padding and a /size (not /size-1)
    normalization."""
    grid = 2.0 * (coords_xy / jnp.asarray([resw, resh], coords_xy.dtype)) - 1.0
    vals = grid_sample_2d(fg_mask_hw[None].astype(jnp.float32), grid,
                          align_corners=False, padding_mode="zeros")[0]
    return vals > 0


def bb_pairs_contrastive_loss(source_bb_f, target_bb_f, source_f, target_f,
                              temp: float = 0.5):
    """Symmetric InfoNCE over best-buddy pairs vs all patches of the other
    frame (reference dino_tracker.py:332-344).

    source_bb_f/target_bb_f: B×C sampled buddy features; source_f/target_f:
    n×C full frame features. Returns (loss_s→t [B], loss_t→s [B]).
    """
    return bb_pairs_contrastive_loss_nc(
        source_bb_f, target_bb_f, source_f, target_f,
        jnp.linalg.norm(source_f, axis=1), jnp.linalg.norm(target_f, axis=1),
        temp)


def bb_pairs_contrastive_loss_nc(source_bb_f, target_bb_f, source_f_nc,
                                 target_f_nc, source_norms_n, target_norms_n,
                                 temp: float = 0.5):
    """``bb_pairs_contrastive_loss`` over n×C frame slabs (channels-minor,
    a tracker.FrameView row) with precomputed per-position norms — lets the
    train step reuse one cast+norm pass of the 265 MB refined stack across
    all loss terms, and contracts the minor axis of both operands (the
    natural MXU GEMM). The frame einsums run in the slab's dtype (the
    step's compute dtype, matching the corr-map einsum policy);
    accumulation stays f32."""
    bb_corrs = jnp.einsum("bc,bc->b", source_bb_f, target_bb_f,
                          preferred_element_type=jnp.float32)
    cd = source_f_nc.dtype
    st = jnp.einsum("bc,nc->bn", source_bb_f.astype(cd), target_f_nc,
                    preferred_element_type=jnp.float32)
    ts = jnp.einsum("bc,nc->bn", target_bb_f.astype(cd), source_f_nc,
                    preferred_element_type=jnp.float32)
    sn = jnp.linalg.norm(source_bb_f, axis=1)
    tn = jnp.linalg.norm(target_bb_f, axis=1)
    st = st / jnp.clip(sn[:, None] * target_norms_n[None, :], min=EPS)
    ts = ts / jnp.clip(tn[:, None] * source_norms_n[None, :], min=EPS)
    bb_corrs = bb_corrs / jnp.clip(sn * tn, min=EPS)
    # -log(exp(pos/T) / Σ exp(row/T)) == logsumexp(row/T) - pos/T
    loss_st = jax.nn.logsumexp(st / temp, axis=1) - bb_corrs / temp
    loss_ts = jax.nn.logsumexp(ts / temp, axis=1) - bb_corrs / temp
    return loss_st, loss_ts


def emb_norm_regularization(frame_embeddings, raw_embeddings,
                            channels_last: bool = False):
    """mean |‖refined‖/‖raw‖ − 1| (reference dino_tracker.py:136-140)."""
    axis = -1 if channels_last else 1
    rn = jnp.linalg.norm(frame_embeddings, axis=axis)
    dn = jnp.linalg.norm(raw_embeddings, axis=axis)
    return jnp.mean(jnp.abs(rn / dn - 1.0))


def emb_angle_regularization(frame_embeddings, raw_embeddings,
                             channels_last: bool = False):
    """mean |cos(refined, raw) − 1| (reference dino_tracker.py:142-146,
    models/utils.py:79-84)."""
    axis = -1 if channels_last else 1
    dot = jnp.sum(frame_embeddings * raw_embeddings, axis=axis,
                  dtype=jnp.float32)
    rn = jnp.linalg.norm(frame_embeddings, axis=axis)
    dn = jnp.linalg.norm(raw_embeddings, axis=axis)
    cos = dot / (rn * dn)
    return jnp.mean(jnp.abs(cos - 1.0))


def mutual_nn(affinity_nm):
    """Mutual-nearest-neighbor mask over a cosine affinity matrix.

    Returns (source_is_bb [n] bool, target_idx [n] int32) where target_idx[i]
    is argmax over the row (meaningful where source_is_bb). Reference
    dino_tracker.py:279-282 / extract_dino_best_buddies.py:37-40.
    """
    n = affinity_nm.shape[0]
    src_max = jnp.argmax(affinity_nm, axis=1)  # n
    tgt_max = jnp.argmax(affinity_nm, axis=0)  # m
    rng = jnp.arange(n)
    return rng == tgt_max[src_max], src_max.astype(jnp.int32)


def cosine_affinity(source_f, target_f, compute_dtype=jnp.float32):
    """n×m cosine affinity with the reference's EPS clamp
    (dino_tracker.py:276-277)."""
    aff = jnp.einsum("nc,mc->nm", source_f.astype(compute_dtype),
                     target_f.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    sn = jnp.linalg.norm(source_f, axis=1)
    tn = jnp.linalg.norm(target_f, axis=1)
    return aff / jnp.clip(sn[:, None] * tn[None, :], min=EPS)
