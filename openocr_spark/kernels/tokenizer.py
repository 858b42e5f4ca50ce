"""Deterministic fixture tokenizer artifact for the tokenizer-backed
decode heads (UniRec, CMER, MGP BPE / word-piece).

The reference treats trained tokenizers as external artifacts loaded at
startup (GPT2 BPE + BERT word-piece in openrec/postprocess/
mgp_postprocess.py:30-44, the UniRec tokenizer json in
tools/infer_unirec_onnx.py:288-331); the decode heads here take the
same boundary — an id→token map — and this module provides the
deterministic sample artifact that drives them end-to-end in tests and
the rec_heads_matrix query: ids are the engine's NUM_CLASSES logit
columns, tokens exercise every special-token path (byte-level Ġ space
markers, ## word-piece continuations, the MGP '#' break token, [SEP],
the UniRec <|…|> chat specials).

The map is shippable as a content-addressed artifact (JSON via
sources/artifacts.py) or inline in ExtractConfig.token_map — it is a
few hundred bytes, so task-closure shipping is also fine.
"""

from __future__ import annotations

import json

from openocr_spark.config import CHARSET, NUM_CLASSES

# specials first (ids 0..9), then single-character fallbacks covering
# the rest of the charset so every logit column has a token
_SPECIALS: tuple[str, ...] = (
    "<|pad|>",   # 0 — the blank column; stripped/skipped everywhere
    "Ġthe",      # 1 — byte-level BPE space marker (Ġ → ' ')
    "quick",     # 2
    "Ġfox",      # 3
    "##es",      # 4 — word-piece continuation (joins without space)
    "jump",      # 5
    "Ġover",     # 6
    "lazy",      # 7
    "Ġdog",      # 8
    "#",         # 9 — the MGP BPE break token (mgp_postprocess.py:113)
    "[SEP]",     # 10 — the word-piece EOS (mgp_postprocess.py:126)
    "<|eos|>",   # 11
    "<|unk|>",   # 12
    "<|bos|>",   # 13
    "<|sn|>",    # 14 — the UniRec soft-newline marker
)


def fixture_token_map() -> tuple[tuple[int, str], ...]:
    """The deterministic (id, token) table: specials at the low ids,
    then the charset characters in order. Exactly NUM_CLASSES entries —
    one per logit column — so any argmax id resolves. Returned as a
    tuple of pairs (hashable → safe inside the frozen ExtractConfig)."""
    toks = list(_SPECIALS)
    for ch in CHARSET:
        if len(toks) >= NUM_CLASSES:
            break
        toks.append(ch)
    assert len(toks) == NUM_CLASSES
    return tuple(enumerate(toks))


def token_map_json() -> str:
    """The artifact serialization (what a deployment checks into its
    artifact store; see sources/artifacts.py)."""
    return json.dumps({str(i): t for i, t in fixture_token_map()}, sort_keys=True)


def load_token_map(path: str) -> tuple[tuple[int, str], ...]:
    with open(path, encoding="utf-8") as f:
        d = json.load(f)
    return tuple(sorted((int(k), v) for k, v in d.items()))


def sep_id(token_map: tuple[tuple[int, str], ...]) -> int | None:
    """The word-piece EOS id ([SEP]) of a map, if present."""
    for i, t in token_map:
        if t == "[SEP]":
            return i
    return None
