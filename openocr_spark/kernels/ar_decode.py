"""Greedy autoregressive decode loop (SURVEY §2.5 W6, §2.6 L4).

Semantics follow the reference's UniRec ONNX generation loop
(/root/reference/tools/infer_unirec_onnx.py:688-716):
  - start from [BOS]
  - per step: run the decoder on the LAST generated token (KV-cache
    style — only the new token crosses the step boundary), take
    argmax of the final-position logits, append
  - stop on EOS or after max_length-1 steps (the L4 generation cap)
  - tokenizer-decode the id sequence, then strip <|...|> control
    tokens (clean_special_tokens, infer_unirec_onnx.py:334-358)

The "model" here is a surrogate step-logits function: a deterministic
transition on (seed, prev_token, step) that returns a full-vocabulary
logits row whose argmax is the next token. The decode loop consumes it
exactly as the reference consumes the ONNX decoder — token-by-token
with feedback — so the sequential semantics (including the cap and the
EOS break) are real and testable even though the network is a stub.
"""

from __future__ import annotations

import hashlib

import numpy as np

PAD_ID = 0
BOS_ID = 1
EOS_ID = 2
SN_ID = 3  # <|sn|> soft-newline control token (cleaned after decode)

_WORDS = (
    "alpha beta gamma delta sigma lambda theta omega "
    "kappa epsilon zeta eta iota rho tau phi"
).split()

ID_TO_TOKEN: dict[int, str] = {SN_ID: "<|sn|>"}
ID_TO_TOKEN.update({4 + i: w for i, w in enumerate(_WORDS)})
VOCAB_SIZE = 4 + len(_WORDS)

DEFAULT_MAX_LENGTH = 64  # reference default is 2048; scaled to fixture text


def seed_of(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def step_logits(seed: int, prev_id: int, step: int) -> np.ndarray:
    """Surrogate decoder step: logits[VOCAB] for the next position given
    the previous token (the feedback edge that makes the loop genuinely
    sequential — next depends on prev, so the sequence cannot be
    produced by a parallel map over steps)."""
    target_len = 3 + seed % 8
    runaway = seed % 31 == 0  # never emits EOS -> exercises the L4 cap
    logits = np.full(VOCAB_SIZE, -4.0, dtype=np.float32)
    if step >= target_len and not runaway:
        nxt = EOS_ID
    elif (prev_id * 7 + step + seed) % 11 == 0:
        nxt = SN_ID
    else:
        nxt = 4 + (prev_id * 31 + step * 7 + seed) % len(_WORDS)
    logits[nxt] = 8.0
    return logits


def ar_greedy_decode(
    seed: int, max_length: int = DEFAULT_MAX_LENGTH
) -> list[int]:
    """The generation loop (infer_unirec_onnx.py:688-716 semantics):
    greedy argmax per step, EOS break, max_length cap."""
    generated = [BOS_ID]
    for step in range(max_length - 1):
        prev = generated[-1]
        logits = step_logits(seed, prev, step)
        next_id = int(np.argmax(logits))
        generated.append(next_id)
        if next_id == EOS_ID:
            break
    return generated


def decode_tokens(ids: list[int]) -> str:
    """Tokenizer decode (F13) + special-token strip (F12): map ids to
    token strings, join with spaces, then remove <|...|> control tokens
    and squeeze the whitespace they leave behind."""
    toks = [ID_TO_TOKEN[i] for i in ids if i in ID_TO_TOKEN]
    text = " ".join(toks)
    # clean_special_tokens semantics (infer_unirec_onnx.py:334-358)
    out: list[str] = []
    for t in text.split(" "):
        if t.startswith("<|") and t.endswith("|>"):
            continue
        if t:
            out.append(t)
    return " ".join(out)


def ar_decode_text(key: str, max_length: int = DEFAULT_MAX_LENGTH) -> str:
    """Full surrogate recognition for one block: seed → loop → decode."""
    return decode_tokens(ar_greedy_decode(seed_of(key), max_length))
