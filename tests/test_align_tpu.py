"""Device batched aligner parity: align_batch == align_pair, byte for byte."""

import random

import pytest

from pbdagcon_tpu.aligner import align_pair
from pbdagcon_tpu.ops.align_tpu import align_batch
from pbdagcon_tpu.simulate import NoiseProfile, random_seq, sample_read


def _noisy_pairs(seed, n, minlen=20, maxlen=250,
                 noise=NoiseProfile(sub=0.05, ins=0.12, dele=0.08)):
    rng = random.Random(seed)
    pairs = []
    for _ in range(n):
        t = random_seq(rng, rng.randint(minlen, maxlen))
        qstr, _ = sample_read(rng, t, 0, len(t), noise)
        pairs.append((qstr.replace("-", ""), t))
    return pairs


def test_align_batch_matches_scalar():
    pairs = _noisy_pairs(1, 16)
    got = align_batch(pairs)
    for (q, t), (gq, gt) in zip(pairs, got):
        eq, et = align_pair(q, t)
        assert (gq, gt) == (eq, et)


def test_align_batch_mixed_lengths_and_empties():
    pairs = _noisy_pairs(2, 6, minlen=5, maxlen=400)
    pairs += [("", "ACGT"), ("ACGT", ""), ("A", "A"), ("A", "T")]
    got = align_batch(pairs)
    for (q, t), (gq, gt) in zip(pairs, got):
        assert (gq, gt) == align_pair(q, t)


def test_align_batch_length_skew():
    """Pairs with large |m-n| exercise the offset-window sizing."""
    rng = random.Random(3)
    pairs = []
    for _ in range(4):
        t = random_seq(rng, 200)
        q = t[40:150]  # much shorter query
        pairs.append((q, t))
        pairs.append((t, t[10:90]))  # much shorter target
    got = align_batch(pairs)
    for (q, t), (gq, gt) in zip(pairs, got):
        assert (gq, gt) == align_pair(q, t)


def test_align_batch_identical_sequences():
    pairs = [("ACGTACGTAA", "ACGTACGTAA")] * 3
    for gq, gt in align_batch(pairs):
        assert gq == gt == "ACGTACGTAA"
