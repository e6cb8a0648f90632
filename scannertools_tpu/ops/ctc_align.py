"""CTC forced alignment — ASR-based per-word transcript timing.

Reference parity: old/transcript_alignment.py:206-342 drives the external
`gentle` (Kaldi) forced-alignment server to produce word-level
(start, end, case) records per sliding caption window. This module is the
same capability as a self-contained TPU program: given CTC emission
log-probs from any character-level acoustic model (e.g. a Wav2Vec2ForCTC
checkpoint via `transformers`, or logits computed elsewhere), a Viterbi
dynamic program over the standard CTC lattice recovers the exact
frame-level path for the transcript and hence per-word (start, end) plus
a per-word acoustic score (gentle's success / not-found-in-audio analog).

TPU-native design notes:
  * The lattice DP is a `lax.scan` over time with a fixed state vector of
    S = 2N+1 interleaved blank/token states — static shapes, no
    data-dependent control flow, vectorized max over the 3 CTC
    transitions (stay / advance / skip-over-blank).
  * Backtrace is a second (reverse) `lax.scan` over the stored argmax
    pointers, so the whole alignment is one jitted program; only the
    final [T] state path leaves the device.
  * jit-cached per (T, S, V) shape; callers batch windows of like shape.

The lattice: state 2i+1 emits token i, even states emit blank. A valid
path may move s->s (stay), s-1->s (advance), and s-2->s (skip a blank)
only when s is a token state whose token differs from the previous token
state's (CTC's repeated-label rule).
"""

from __future__ import annotations

import dataclasses
import functools
import re
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

NEG = -1e30

# Character vocabulary for transcript encoding (wav2vec2-style: a word
# delimiter token separates words; blank is index 0 by convention here —
# pass `blank=` to match a checkpoint whose blank sits elsewhere).
WORD_DELIM = "|"


def char_vocab() -> Dict[str, int]:
    """Default char vocab: <blank>=0, '|'=1, a-z, apostrophe."""
    toks = [WORD_DELIM] + list("abcdefghijklmnopqrstuvwxyz") + ["'"]
    return {t: i + 1 for i, t in enumerate(toks)}


def encode_transcript(text: str, vocab: Dict[str, int]):
    """-> (tokens, words, word_spans): token ids with a word-delimiter
    between words, the normalized word list, and each word's [a, b) span
    in the token sequence."""
    words = [w for w in re.split(r"\s+", text.strip().lower()) if w]
    words = [re.sub(r"[^a-z']", "", w) for w in words]
    # drop characters the checkpoint vocab cannot emit (e.g. apostrophes in
    # several wav2vec2 fine-tunes) instead of KeyError-ing mid-alignment;
    # words with no encodable characters are dropped entirely
    words = ["".join(ch for ch in w if ch in vocab) for w in words]
    words = [w for w in words if w]
    delim = vocab.get(WORD_DELIM)
    tokens: List[int] = []
    spans = []
    for k, w in enumerate(words):
        if k and delim is not None:
            tokens.append(delim)
        a = len(tokens)
        tokens.extend(vocab[ch] for ch in w)
        spans.append((a, len(tokens)))
    return tokens, words, spans


@functools.lru_cache(maxsize=64)
def _viterbi_fn(T: int, S: int, V: int):
    """jitted CTC Viterbi for shapes: log_probs [T, V], labels_ext [S],
    allow_skip [S] -> (states [T] int32, score f32)."""

    def run(log_probs, labels_ext, allow_skip):
        emit = jnp.take(log_probs, labels_ext, axis=1)  # [T, S]
        # alpha[s] at t=0: only states 0 (leading blank) and 1 (first token)
        init = jnp.where(jnp.arange(S) <= 1, emit[0], NEG)

        def step(alpha, emit_t):
            stay = alpha
            adv = jnp.concatenate([jnp.full((1,), NEG), alpha[:-1]])
            skip = jnp.where(
                allow_skip,
                jnp.concatenate([jnp.full((2,), NEG), alpha[:-2]]), NEG)
            cand = jnp.stack([stay, adv, skip])  # [3, S]
            bp = jnp.argmax(cand, axis=0).astype(jnp.int32)
            return jnp.max(cand, axis=0) + emit_t, bp

        alpha, bps = lax.scan(step, init, emit[1:])  # bps: [T-1, S]
        # final state: last token or trailing blank
        final = jnp.where(alpha[S - 1] >= alpha[S - 2] if S > 1 else True,
                          S - 1, S - 2) if S > 1 else jnp.int32(0)
        final = jnp.asarray(final, jnp.int32)
        score = alpha[final]

        def back(state, bp_t):
            step_back = bp_t[state]
            return state - step_back, state

        first, states_rev = lax.scan(back, final, bps, reverse=True)
        states = jnp.concatenate([first[None], states_rev])
        return states, score

    return jax.jit(run)


def ctc_forced_align(log_probs: np.ndarray, tokens: Sequence[int],
                     blank: int = 0):
    """Viterbi-align `tokens` to CTC emissions.

    log_probs: [T, V] log-softmax emissions. tokens: N label ids (no
    blanks). Returns (token_index_per_frame [T] int32 with -1 on blank
    frames, path_score float). Requires T >= number of lattice-mandatory
    frames (N plus a blank between equal neighbors)."""
    tokens = np.asarray(tokens, np.int32)
    N = len(tokens)
    if N == 0:
        T = log_probs.shape[0]
        return np.full(T, -1, np.int32), float(log_probs[:, blank].sum())
    S = 2 * N + 1
    labels_ext = np.full(S, blank, np.int32)
    labels_ext[1::2] = tokens
    allow_skip = np.zeros(S, bool)
    # skip s-2 -> s for token states whose token differs from the previous
    allow_skip[3::2] = tokens[1:] != tokens[:-1]
    T, V = log_probs.shape
    need = N + int((tokens[1:] == tokens[:-1]).sum())
    if T < need:
        raise ValueError(f"{T} frames cannot realize {N} tokens "
                         f"({need} lattice-mandatory frames)")
    states, score = _viterbi_fn(T, S, V)(
        jnp.asarray(log_probs, jnp.float32), jnp.asarray(labels_ext),
        jnp.asarray(allow_skip))
    states = np.asarray(states)
    tok_idx = np.where(states % 2 == 1, (states - 1) // 2, -1)
    return tok_idx.astype(np.int32), float(score)


@dataclasses.dataclass
class AlignedWord:
    """gentle-style word record: absolute seconds + mean per-char emission
    log-prob (0 is perfect; ~log(1/V) is chance — see `success` below)."""

    word: str
    start: float
    end: float
    score: float

    def success(self, thresh: float = -4.0) -> bool:
        """gentle 'success' vs 'not-found-in-audio' analog."""
        return self.score > thresh


def align_transcript_ctc(log_probs: np.ndarray, transcript: str,
                         frame_s: float, vocab: Optional[Dict[str, int]]
                         = None, blank: int = 0,
                         t0: float = 0.0) -> List[AlignedWord]:
    """Per-word alignment of `transcript` against CTC emissions.

    log_probs: [T, V] log-softmax acoustic frames of duration `frame_s`
    seconds starting at absolute time `t0`. Returns one AlignedWord per
    transcript word; a word's score is the mean emission log-prob of its
    aligned character frames (low = not actually spoken there)."""
    vocab = vocab or char_vocab()
    tokens, words, spans = encode_transcript(transcript, vocab)
    if not words:
        return []
    tok_idx, _ = ctc_forced_align(log_probs, tokens, blank=blank)
    lp = np.asarray(log_probs)
    out = []
    tok_arr = np.asarray(tokens)
    for w, (a, b) in zip(words, spans):
        frames = np.nonzero((tok_idx >= a) & (tok_idx < b))[0]
        if len(frames) == 0:  # degenerate — shouldn't happen on valid T
            out.append(AlignedWord(w, t0, t0, float(NEG)))
            continue
        f0, f1 = int(frames[0]), int(frames[-1]) + 1
        score = float(np.mean(
            lp[frames, tok_arr[tok_idx[frames]]]))
        out.append(AlignedWord(w, t0 + f0 * frame_s, t0 + f1 * frame_s,
                               score))
    return out


def wav2vec2_log_probs(samples: np.ndarray, sample_rate: int,
                       model_name_or_path: str):
    """Emissions from a transformers Wav2Vec2ForCTC checkpoint (weights
    must be on disk — zero-egress environments can't download). Returns
    (log_probs [T, V], frame_s, vocab, blank). The returned vocab maps
    lowercase chars + '|' to ids so it plugs into align_transcript_ctc."""
    import torch  # CPU build is in the image
    from transformers import Wav2Vec2ForCTC, Wav2Vec2Processor

    processor = Wav2Vec2Processor.from_pretrained(model_name_or_path)
    model = Wav2Vec2ForCTC.from_pretrained(model_name_or_path)
    model.eval()
    if sample_rate != 16000:
        idx = np.linspace(0, len(samples) - 1,
                          int(len(samples) * 16000 / sample_rate))
        samples = np.interp(idx, np.arange(len(samples)), samples)
        sample_rate = 16000
    inputs = processor(samples, sampling_rate=sample_rate,
                       return_tensors="pt")
    with torch.no_grad():
        logits = model(inputs.input_values).logits[0]
    log_probs = torch.log_softmax(logits, dim=-1).numpy()
    frame_s = len(samples) / sample_rate / log_probs.shape[0]
    hf_vocab = processor.tokenizer.get_vocab()
    vocab = {k.lower(): v for k, v in hf_vocab.items()
             if len(k) == 1 or k == WORD_DELIM}
    blank = hf_vocab.get(processor.tokenizer.pad_token, 0)
    return log_probs, frame_s, vocab, blank
