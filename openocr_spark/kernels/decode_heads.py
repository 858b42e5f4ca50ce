"""Per-architecture decode heads (SURVEY §2.9 F1 — the reference ships
16 postprocess variants; VERDICT r2 missing-item 1).

Each head is a vocabulary/stop-rule/skip-rule/confidence permutation
over the same argmax surface. All are from-scratch numpy functions —
the reference implements them as torch Label-Decode classes; here each
is a pure (logits | token_ids) → (text, confidence) kernel usable from
the Arrow-batched recognition UDFs. Reference anchors (semantics, not
code):

  abinet    openrec/postprocess/abinet_postprocess.py:17-37
  cppd      openrec/postprocess/cppd_postprocess.py:18-42
  smtr      openrec/postprocess/smtr_postprocess.py:39-73
  lister    openrec/postprocess/lister_postprocess.py:32-58
  igtr      openrec/postprocess/igtr_postprocess.py:58-100
  ce        openrec/postprocess/ce_postprocess.py:16-43
  visionlan openrec/postprocess/visionlan_postprocess.py:48-81
  mgp       openrec/postprocess/mgp_postprocess.py:59-103 (char head),
            63-79 (tri-head fusion)
  char      openrec/postprocess/char_postprocess.py:17-107 (dual head)
  unirec    openrec/postprocess/unirec_postprocess.py:4-53
  cmer      openrec/postprocess/cmer_postprocess.py:62-87

The tokenizer-backed heads (unirec, cmer, mgp bpe/wp) take an
id→token mapping parameter: the trained tokenizer files are external
model artifacts (like weights), but the decode semantics — special-
token cleaning rules, EOS search, confidence products — are
implemented here exactly.
"""

from __future__ import annotations

import re

import numpy as np

from openocr_spark.kernels.recognition import softmax


def _argmax_conf(logits: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if logits is None or logits.size == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    probs = softmax(np.asarray(logits, dtype=np.float64), axis=1)
    return probs.argmax(axis=1), probs.max(axis=1)


def _eos_loop(
    ids: np.ndarray,
    conf: np.ndarray,
    vocab: list[str],
    skip: frozenset[str],
) -> tuple[list[str], list[float]]:
    """The shared NRTR-family position loop: out-of-range index skipped
    (the reference's try/except-continue), break at '</s>', `skip`
    tokens dropped, everything else kept with its probability."""
    chars: list[str] = []
    confs: list[float] = []
    for i, k in enumerate(ids):
        k = int(k)
        if k < 0 or k >= len(vocab):
            continue
        ch = vocab[k]
        if ch == "</s>":
            break
        if ch in skip:
            continue
        chars.append(ch)
        confs.append(float(conf[i]))
    return chars, confs


def _mean_result(chars: list[str], confs: list[float]) -> tuple[str, float]:
    if not chars:
        return "", 0.0
    return "".join(chars), float(np.mean(confs))


def abinet_decode(
    logits: np.ndarray,
    charset: str | None = None,
    vision_logits: np.ndarray | None = None,
) -> tuple[str, float]:
    """ABINet head (abinet_postprocess.py): vocabulary is ['</s>'] +
    charset (EOS id 0 — add_special_char:35-37), per-position argmax,
    break at '</s>', no duplicate removal, mean confidence. The model
    emits a list of alignment-iteration outputs plus a vision branch;
    decode prefers the final alignment and falls back to vision when
    the alignment list is empty (:17-21) — modeled by the optional
    vision_logits fallback (pass logits=None to use it)."""
    from openocr_spark.config import CHARSET

    if logits is None or logits.size == 0:
        if vision_logits is None or vision_logits.size == 0:
            return "", 0.0
        logits = vision_logits
    vocab = ["</s>"] + list(charset or CHARSET)
    ids, conf = _argmax_conf(logits)
    return _mean_result(*_eos_loop(ids, conf, vocab, frozenset()))


def cppd_decode(
    iter_logits: list[np.ndarray] | np.ndarray,
    charset: str | None = None,
) -> tuple[str, float]:
    """CPPD head (cppd_postprocess.py): same ['</s>']-prepended
    vocabulary and EOS-break loop as ABINet (:40-42); the model emits a
    sequence of refinement-iteration outputs and decode reads the LAST
    one (:18-29)."""
    from openocr_spark.config import CHARSET

    logits = iter_logits[-1] if isinstance(iter_logits, (list, tuple)) else iter_logits
    if logits is None or logits.size == 0:
        return "", 0.0
    vocab = ["</s>"] + list(charset or CHARSET)
    ids, conf = _argmax_conf(logits)
    return _mean_result(*_eos_loop(ids, conf, vocab, frozenset()))


def smtr_decode(
    logits: np.ndarray,
    charset: str | None = None,
    next_mode: bool = True,
) -> tuple[str, float]:
    """SMTR head (smtr_postprocess.py:39-73): vocabulary ['</s>'] +
    charset + ['<s>', '<INF>', '<INB>', '<pad>']; break at '</s>',
    skip '<s>'/'<pad>'. Faithful quirks: <INF>/<INB> are NOT in the
    skip set — the reference's decode loop appends them literally when
    predicted (:59-64); next_mode=False (the backward sub-string scan)
    REVERSES the decoded characters (:67-70)."""
    from openocr_spark.config import CHARSET

    if logits is None or logits.size == 0:
        return "", 0.0
    vocab = ["</s>"] + list(charset or CHARSET) + ["<s>", "<INF>", "<INB>", "<pad>"]
    ids, conf = _argmax_conf(logits)
    chars, confs = _eos_loop(ids, conf, vocab, frozenset({"<s>", "<pad>"}))
    if not chars:
        return "", 0.0
    text = "".join(chars) if next_mode else "".join(chars[::-1])
    return text, float(np.mean(confs))


def lister_decode(
    logits: np.ndarray, charset: str | None = None
) -> tuple[str, float]:
    """LISTER head (lister_postprocess.py:32-58): vocabulary ['</s>'] +
    charset + ['<pad>']; break at '</s>', skip '<s>'/'<pad>', mean
    confidence."""
    from openocr_spark.config import CHARSET

    if logits is None or logits.size == 0:
        return "", 0.0
    vocab = ["</s>"] + list(charset or CHARSET) + ["<pad>"]
    ids, conf = _argmax_conf(logits)
    return _mean_result(*_eos_loop(ids, conf, vocab, frozenset({"<s>", "<pad>"})))


def igtr_decode(
    logits: np.ndarray,
    charset: str | None = None,
    with_top5: bool = False,
) -> tuple[str, float] | tuple[str, float, list[list[str]]]:
    """IGTR head (igtr_postprocess.py:58-100): vocabulary ['</s>'] +
    charset + ['<s>', '<pad>']; break at '</s>', skip '<s>'/'<pad>'.
    with_top5 additionally returns, per kept position, the 5 highest-
    scoring vocabulary entries in ascending-score order (argsort[...,-5:]
    — the reference's candidate list for its interactive refinement)."""
    from openocr_spark.config import CHARSET

    vocab = ["</s>"] + list(charset or CHARSET) + ["<s>", "<pad>"]
    if logits is None or logits.size == 0:
        return ("", 0.0, []) if with_top5 else ("", 0.0)
    probs = softmax(logits.astype(np.float64), axis=1)
    ids = probs.argmax(axis=1)
    conf = probs.max(axis=1)
    if not with_top5:
        return _mean_result(*_eos_loop(ids, conf, vocab, frozenset({"<s>", "<pad>"})))
    top5_idx = probs.argsort(axis=1)[:, -5:]
    chars: list[str] = []
    confs: list[float] = []
    top5: list[list[str]] = []
    for i, k in enumerate(ids):
        k = int(k)
        if k < 0 or k >= len(vocab):
            continue
        # the reference resolves the top-5 candidates inside the same
        # try block as the argmax char: an out-of-range candidate skips
        # the whole position (igtr_postprocess.py:75-83)
        if any(int(t) >= len(vocab) for t in top5_idx[i]):
            continue
        ch = vocab[k]
        if ch == "</s>":
            break
        if ch in ("<s>", "<pad>"):
            continue
        chars.append(ch)
        confs.append(float(conf[i]))
        top5.append([vocab[int(t)] for t in top5_idx[i]])
    if not chars:
        return "", 0.0, []
    return "".join(chars), float(np.mean(confs)), top5


def ce_decode(
    logits: np.ndarray, charset: str | None = None
) -> tuple[str, float]:
    """CE head (ce_postprocess.py:16-43): a whole-image classification
    head — ONE position, plain charset with no specials; text is the
    single argmax character, confidence its probability."""
    from openocr_spark.config import CHARSET

    vocab = list(charset or CHARSET)
    if logits is None or logits.size == 0:
        return "", 0.0
    v = logits.reshape(-1).astype(np.float64)
    p = softmax(v[None, :], axis=1)[0]
    k = int(p.argmax())
    if k >= len(vocab):
        return "", 0.0
    return vocab[k], float(p[k])


def visionlan_decode(
    logits: np.ndarray,
    length: int | None = None,
    charset: str | None = None,
) -> tuple[str, float]:
    """VisionLAN head (visionlan_postprocess.py:48-81): class ids are
    1-based (`character[idx - 1]`, id 0 and out-of-vocabulary ids decode
    to '' — :69-72); the model also predicts the text LENGTH and decode
    reads exactly that many positions; confidence is the GEOMETRIC mean
    exp(Σ log p / (n + 1e-6)) (:74-77), not the arithmetic mean the
    other heads use."""
    from openocr_spark.config import CHARSET

    vocab = list(charset or CHARSET)
    if logits is None or logits.size == 0:
        return "", 0.0
    probs = softmax(logits.astype(np.float64), axis=1)
    n = len(probs) if length is None else min(int(length), len(probs))
    probs = probs[:n]
    ids = probs.argmax(axis=1)
    conf = probs.max(axis=1)
    text = "".join(
        vocab[int(k) - 1] if 0 < int(k) <= len(vocab) else "" for k in ids
    )
    if len(conf) == 0:
        return "", 0.0
    score = float(np.exp(np.log(np.maximum(conf, 1e-300)).sum() / (len(conf) + 1e-6)))
    return text, score


def mgp_char_decode(
    logits: np.ndarray, charset: str | None = None
) -> tuple[str, float]:
    """MGP character head (mgp_postprocess.py:59-103): vocabulary
    ['[GO]', '[s]'] + charset; position 0 is the BOS slot and is
    dropped before decoding (:36-37); '[s]' is EOS, '[GO]' is skipped.
    Faithful quirks: confidence is the PRODUCT of per-position
    probabilities, and the multiply happens BEFORE the EOS check, so
    the EOS position's probability IS included in the product
    (:88-97); out-of-range ids skip the position."""
    from openocr_spark.config import CHARSET

    vocab = ["[GO]", "[s]"] + list(charset or CHARSET)
    if logits is None or len(logits) < 2:
        return "", 1.0
    probs = softmax(logits.astype(np.float64), axis=1)[1:]  # drop BOS slot
    ids = probs.argmax(axis=1)
    conf = probs.max(axis=1)
    chars: list[str] = []
    score = 1.0
    for i, k in enumerate(ids):
        k = int(k)
        if k < 0 or k >= len(vocab):
            continue
        ch = vocab[k]
        score *= float(conf[i])
        if ch == "[s]":
            break
        if ch == "[GO]":
            continue
        chars.append(ch)
    return "".join(chars), score


def mgp_fuse(
    char_res: tuple[str, float],
    bpe_res: tuple[str, float],
    wp_res: tuple[str, float],
) -> tuple[str, float]:
    """MGP tri-head fusion (mgp_postprocess.py:63-79): start from the
    character head, replace with the BPE head when STRICTLY more
    confident, then with the word-piece head when strictly more
    confident again — ties keep the earlier head."""
    text, prob = char_res
    if bpe_res[1] > prob:
        text, prob = bpe_res
    if wp_res[1] > prob:
        text, prob = wp_res
    return text, prob


def char_dual_decode(
    text_logits: np.ndarray,
    char_logits: np.ndarray,
    charset: str | None = None,
) -> tuple[tuple[str, float], tuple[str, float]]:
    """Char dual head (char_postprocess.py:17-107): the main sequence
    decodes over the NRTR vocabulary ['blank','<unk>','<s>','</s>'] +
    charset with EOS break; the auxiliary per-character branch has NO
    specials — its argmax is offset by +4 into the same vocabulary
    (:33-34) and it stops exactly where the main sequence stops.
    Returns ((text, conf), (box_text, box_conf))."""
    from openocr_spark.config import CHARSET

    vocab = ["blank", "<unk>", "<s>", "</s>"] + list(charset or CHARSET)
    if text_logits is None or text_logits.size == 0:
        return ("", 0.0), ("", 0.0)
    ids, conf = _argmax_conf(text_logits)
    c_probs = softmax(char_logits.astype(np.float64), axis=1)
    c_ids = c_probs.argmax(axis=1) + 4
    c_conf = c_probs.max(axis=1)
    chars: list[str] = []
    confs: list[float] = []
    box_chars: list[str] = []
    box_confs: list[float] = []
    for i, k in enumerate(ids):
        k = int(k)
        # both branches resolve inside one try block: either index out
        # of range skips the position for both (char_postprocess.py:76-84)
        if k >= len(vocab) or i >= len(c_ids) or int(c_ids[i]) >= len(vocab):
            continue
        ch = vocab[k]
        if ch == "</s>":
            break
        chars.append(ch)
        confs.append(float(conf[i]))
        box_chars.append(vocab[int(c_ids[i])])
        box_confs.append(float(c_conf[i]))
    main = ("".join(chars), float(np.mean(confs)) if confs else 0.0)
    box = ("".join(box_chars), float(np.mean(box_confs)) if box_confs else 0.0)
    return main, box


# --- tokenizer-backed heads -------------------------------------------------

# unirec_postprocess.py:4-13 — the exact rewrite rules, in order
_UNIREC_RULES = (
    (r"-<\|sn\|>", ""),
    (r" <\|sn\|>", " "),
    (r"<\|sn\|>", " "),
    (r"<\|unk\|>", ""),
    (r"<s>", ""),
    (r"</s>", ""),
    ("￿", ""),
    (r"_{4,}", "___"),
    (r"\.{4,}", "..."),
)


def unirec_clean_special_tokens(text: str) -> str:
    """unirec_postprocess.py:16-23: byte-level BPE markers (Ġ=space,
    Ċ=newline), chat-special strip, then the ordered regex rules."""
    text = (
        text.replace("Ġ", " ")
        .replace("Ċ", "\n")
        .replace("<|bos|>", "")
        .replace("<|eos|>", "")
        .replace("<|pad|>", "")
    )
    for pat, rep in _UNIREC_RULES:
        text = re.sub(pat, rep, text)
    return text


def unirec_decode(
    token_ids: list[int] | np.ndarray,
    id_to_token: dict[int, str],
) -> tuple[str, float]:
    """UniRec head (unirec_postprocess.py:42-53): concatenate the
    tokens for the predicted ids, then apply the special-token cleaning
    rules; confidence is fixed 0.0 (the reference emits none). The
    trained tokenizer is an external artifact — pass its id→token map;
    unknown ids render as '<|unk|>' (and are then cleaned away)."""
    raw = "".join(id_to_token.get(int(t), "<|unk|>") for t in token_ids)
    return unirec_clean_special_tokens(raw), 0.0


def mgp_bpe_decode(
    token_ids: list[int] | np.ndarray,
    probs: list[float] | np.ndarray,
    id_to_token: dict[int, str],
) -> tuple[str, float]:
    """MGP BPE head (mgp_postprocess.py:105-119): decode token by
    token, BREAK at the literal '#' token (before appending or
    multiplying — unlike char_decode, the break position's probability
    is NOT in the product), confidence is the PRODUCT of the kept
    positions' probabilities. Faithful quirk: conf starts at 1.0, so an
    immediate '#' yields ('', 1.0). The trained BPE tokenizer is an
    external artifact — pass its id→token map (kernels/tokenizer.py
    ships the deterministic fixture one); unknown ids decode to ''."""
    text_decoded: list[str] = []
    conf = 1.0
    for t, p in zip(token_ids, probs):
        # the reference decodes each id via GPT2Tokenizer.decode([id]),
        # which maps the byte-level space marker back: 'Ġthe' → ' the';
        # the '#' comparison happens on that DECODED string
        tok = id_to_token.get(int(t), "").replace("Ġ", " ")
        if tok == "#":
            break
        text_decoded.append(tok)
        conf *= float(p)
    return "".join(text_decoded), float(conf)


def wp_join(tokens: list[str]) -> str:
    """BertTokenizer.decode exact: ' '.join(tokens).replace(' ##', '')
    (convert_tokens_to_string), then transformers'
    clean_up_tokenization — the de-spacing of punctuation and English
    contractions that decode() applies by default
    (clean_up_tokenization_spaces=True; the reference pins
    transformers==4.2.1, mgp_postprocess.py:30). Pinned against the
    reference's own wp_decode in test_decode_heads_differential —
    the cleanup step is where the previous skip-empties loop join
    diverged ('sat ,' vs the reference's 'sat,')."""
    s = " ".join(tokens).replace(" ##", "")
    return (
        s.replace(" .", ".").replace(" ?", "?").replace(" !", "!")
        .replace(" ,", ",").replace(" ' ", "'").replace(" n't", "n't")
        .replace(" 'm", "'m").replace(" 's", "'s").replace(" 've", "'ve")
        .replace(" 're", "'re")
    )


def mgp_wp_decode(
    token_ids: list[int] | np.ndarray,
    probs: list[float] | np.ndarray,
    id_to_token: dict[int, str],
    sep_id: int | None = None,
) -> tuple[str, float]:
    """MGP word-piece head (mgp_postprocess.py:121-143): detokenize the
    WHOLE sequence, truncate the STRING at '[SEP]', confidence is the
    probability product up to (and including) the [SEP] position.
    Faithful quirks preserved: when '[SEP]' is absent from the decoded
    string, `find` returns -1 and the slice drops the LAST CHARACTER;
    when sep_id is absent from the ids, the product runs over
    probs[:-1]; an empty product slice yields 0.0 (the reference's
    cumprod-on-empty exception path)."""
    toks = [id_to_token.get(int(t), "") for t in token_ids]
    wp_pred = wp_join(toks)
    wp_pred = wp_pred[: wp_pred.find("[SEP]")]
    ids = [int(t) for t in token_ids]
    if sep_id is not None and sep_id in ids:
        eos_index = ids.index(sep_id) + 1
    else:
        eos_index = -1
    window = list(probs)[:eos_index]
    if not window:
        return wp_pred, 0.0
    conf = 1.0
    for p in window:
        conf *= float(p)
    return wp_pred, float(conf)


CMER_SPECIALS = frozenset({"<|pad|>", "<|bos|>", "<|eos|>", "<|unk|>"})


def cmer_decode(
    token_ids: list[int] | np.ndarray,
    id_to_token: dict[int, str],
) -> tuple[str, float]:
    """CMER head (cmer_postprocess.py:62-87): tokenizer batch_decode
    with special tokens skipped, then remove ALL spaces and strip;
    confidence is fixed 0.0. Pass the tokenizer's id→token map (the
    trained tokenizer json is an external artifact)."""
    toks = [
        id_to_token.get(int(t), "")
        for t in token_ids
        if id_to_token.get(int(t), "") not in CMER_SPECIALS
    ]
    text = "".join(toks).replace(" ", "").strip()
    return text, 0.0
