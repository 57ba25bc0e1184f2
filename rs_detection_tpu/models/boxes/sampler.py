"""Positive/negative sampling as static-shape mask selection.

Capability parity with the reference samplers
(``python/jdet/models/boxes/sampler.py``: ``PseudoSampler`` :114,
``RandomSampler`` :133, ``RandomSamplerRotated`` :179).

TPU-first reformulation: the reference returns variable-length index
lists; here sampling produces fixed-size *weight masks* over all
candidates — random subset selection is "top-k of randomized scores",
which is exactly a uniform sample without replacement and jit-compiles
to one sort. PRNG keys are explicit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils.registry import BOXES


def random_choice_mask(mask: jnp.ndarray, num_expected: int,
                       key: jax.Array) -> jnp.ndarray:
    """Uniformly choose up to ``num_expected`` True entries of ``mask``.

    Returns a bool mask of the chosen subset. If the set has fewer
    elements than requested, all are kept (reference semantics).
    """
    n = mask.shape[0]
    scores = jax.random.uniform(key, (n,))
    scores = jnp.where(mask, scores, -1.0)
    k = min(num_expected, n)
    _, idx = jax.lax.top_k(scores, k)
    chosen = jnp.zeros((n,), bool).at[idx].set(True)
    return chosen & mask


@BOXES.register_module()
class PseudoSampler:
    """Keep every positive and negative (reference ``sampler.py:114``)."""

    def __init__(self, **kw):
        pass

    def sample(self, assigned_gt_inds: jnp.ndarray, key=None):
        pos = assigned_gt_inds > 0
        neg = assigned_gt_inds == 0
        return pos, neg


@BOXES.register_module()
class RandomSampler:
    """Random balanced sampling (reference ``sampler.py:133-178``).

    ``add_gt_as_proposals`` is handled by the caller (it concatenates
    GT boxes into the candidate set before assignment — shapes must be
    static there anyway).
    """

    def __init__(self, num, pos_fraction, neg_pos_ub=-1,
                 add_gt_as_proposals=True, **kw):
        self.num = num
        self.pos_fraction = pos_fraction
        self.neg_pos_ub = neg_pos_ub
        self.add_gt_as_proposals = add_gt_as_proposals

    def sample(self, assigned_gt_inds: jnp.ndarray, key: jax.Array):
        """Returns (pos_mask, neg_mask) with counts capped at
        num*pos_fraction positives and the remainder negatives."""
        pos_cand = assigned_gt_inds > 0
        neg_cand = assigned_gt_inds == 0
        k_pos, k_neg = jax.random.split(key)

        num_expected_pos = int(self.num * self.pos_fraction)
        pos = random_choice_mask(pos_cand, num_expected_pos, k_pos)
        num_pos = pos.sum()
        num_expected_neg = self.num - jnp.minimum(num_pos, num_expected_pos)
        if self.neg_pos_ub >= 0:
            num_expected_neg = jnp.minimum(
                num_expected_neg,
                jnp.maximum(1, self.neg_pos_ub * num_pos))
        # dynamic negative budget: keep the best num_expected_neg
        # random scores among negatives. The budget is bounded by
        # self.num, so a k=num top_k + tiny scatter replaces the full
        # argsort + [A] rank scatter (9.6 + 11 ms/step at 611k RPN
        # anchors, batch 4).
        n = neg_cand.shape[0]
        scores = jax.random.uniform(k_neg, (n,))
        scores = jnp.where(neg_cand, scores, -1.0)
        kmax = min(self.num, n)
        vals, idx = jax.lax.top_k(scores, kmax)
        take = (jnp.arange(kmax) < num_expected_neg) & (vals > -1.0)
        neg = jnp.zeros((n,), bool).at[idx].set(take)
        return pos, neg


@BOXES.register_module()
class RandomSamplerRotated(RandomSampler):
    """Rotated-box variant — sampling logic is box-type agnostic here
    (reference ``sampler.py:179-231``)."""
