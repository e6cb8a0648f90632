"""CTC forced alignment (ops/ctc_align.py) — the gentle/Kaldi role in the
reference's TranscriptAligner (old/transcript_alignment.py:206-342), here a
Viterbi DP over the CTC lattice run as one jitted lax.scan program.

Tests build synthetic emissions from a known ground-truth frame labeling
(near-one-hot log-probs) so recovered word boundaries are exact."""

import numpy as np
import pytest

from scannertools_tpu.ops.ctc_align import (AlignedWord, align_transcript_ctc,
                                            char_vocab, ctc_forced_align,
                                            encode_transcript)


def _emissions(frame_labels, V, hot=0.0, cold=-12.0):
    """[T, V] log-probs concentrated on the given per-frame labels."""
    T = len(frame_labels)
    lp = np.full((T, V), cold, np.float32)
    lp[np.arange(T), frame_labels] = hot
    return lp


def test_forced_align_recovers_exact_path():
    vocab = char_vocab()
    V = max(vocab.values()) + 1
    # "hi" = h i ; GT frames: blank h h i blank
    h, i = vocab["h"], vocab["i"]
    frames = [0, h, h, i, 0]
    lp = _emissions(frames, V)
    tok_idx, score = ctc_forced_align(lp, [h, i])
    assert tok_idx.tolist() == [-1, 0, 0, 1, -1]
    assert score > -1.0  # all frames on the GT path


def test_repeated_token_requires_blank():
    """CTC's repeated-label rule: 'aa' must pass through a blank, so the
    middle frame aligns to blank even when 'a' is the hottest label there."""
    vocab = char_vocab()
    V = max(vocab.values()) + 1
    a = vocab["a"]
    lp = _emissions([a, a, a], V)
    tok_idx, _ = ctc_forced_align(lp, [a, a])
    assert tok_idx.tolist() == [0, -1, 1]


def test_too_few_frames_raises():
    vocab = char_vocab()
    V = max(vocab.values()) + 1
    a = vocab["a"]
    with pytest.raises(ValueError):
        ctc_forced_align(_emissions([a, a], V), [a, a])  # needs 3 frames


def test_word_alignment_and_scores():
    vocab = char_vocab()
    V = max(vocab.values()) + 1
    text = "hello world"
    tokens, words, spans = encode_transcript(text, vocab)
    assert words == ["hello", "world"]
    # GT frame labeling: each token 2 frames, blank between the repeated
    # l-l and around the word delimiter; 50 ms frames
    gt = []
    prev = None
    for t in tokens:
        if prev == t:
            gt.append(0)
        gt.extend([t, t])
        prev = t
    gt = [0] + gt + [0]
    lp = _emissions(gt, V)
    out = align_transcript_ctc(lp, text, frame_s=0.05, vocab=vocab)
    assert [w.word for w in out] == ["hello", "world"]
    hello, world = out
    # hello spans frames 1..11 (h h e e l l <b> l l o o)
    assert hello.start == pytest.approx(0.05)
    assert hello.end == pytest.approx(0.05 * 12)
    assert world.end <= 0.05 * len(gt)
    assert hello.start < hello.end < world.start < world.end
    for w in out:
        assert w.success()  # on-path frames score ~0


def test_missing_word_scores_low():
    """A word whose characters never appear in the audio aligns somewhere
    (forced) but its acoustic score flags it — gentle's
    not-found-in-audio analog."""
    vocab = char_vocab()
    V = max(vocab.values()) + 1
    tokens, _, _ = encode_transcript("hi", vocab)
    gt = [0] + [t for t in tokens for _ in (0, 1)] + [0] * 8
    lp = _emissions(gt, V)
    out = align_transcript_ctc(lp, "hi zebra", frame_s=0.05, vocab=vocab)
    assert out[0].word == "hi" and out[0].success()
    assert out[1].word == "zebra" and not out[1].success()


def test_transcript_aligner_ctc_windows():
    """TranscriptAligner.align_words_ctc slices emissions per caption."""
    import dataclasses

    from scannertools_tpu.ops.legacy_extras import TranscriptAligner

    @dataclasses.dataclass
    class Cap:
        line: str
        start: float
        end: float

    vocab = char_vocab()
    V = max(vocab.values()) + 1
    h, i = vocab["h"], vocab["i"]
    g, o = vocab["g"], vocab["o"]
    fs = 0.1
    # audio: "hi" at 1.0-1.4s, "go" at 3.0-3.4s, silence elsewhere
    gt = [0] * 50
    gt[10:14] = [h, h, i, i]
    gt[30:34] = [g, g, o, o]
    lp = _emissions(gt, V)
    caps = [Cap("hi", 0.9, 1.5), Cap("go", 2.9, 3.5)]
    out = TranscriptAligner().align_words_ctc(caps, lp, fs, vocab=vocab)
    assert [w.word for w in out] == ["hi", "go"]
    assert out[0].start == pytest.approx(1.0, abs=fs)
    assert out[0].end == pytest.approx(1.4, abs=fs)
    assert out[1].start == pytest.approx(3.0, abs=fs)
    assert out[1].end == pytest.approx(3.4, abs=fs)
    assert all(isinstance(w, AlignedWord) and w.success() for w in out)


def test_unencodable_chars_dropped_not_keyerror():
    """Checkpoint vocabs missing the apostrophe (several wav2vec2
    fine-tunes) or the word delimiter must not KeyError: unencodable
    characters are dropped from words, fully-unencodable words vanish."""
    vocab = {c: i + 1 for i, c in enumerate("abcdefghijklmnopqrstuvwxyz")}
    # no "'", no "|"
    tokens, words, spans = encode_transcript("don't stop ''", vocab)
    assert words == ["dont", "stop"]
    assert len(tokens) == len("dontstop")  # no delimiter inserted
    V = 27
    gt = [0] + [t for t in tokens for _ in (0, 1)] + [0]
    lp = _emissions(gt, V)
    out = align_transcript_ctc(lp, "don't stop", frame_s=0.05, vocab=vocab)
    assert [w.word for w in out] == ["dont", "stop"]
    assert all(w.success() for w in out)
