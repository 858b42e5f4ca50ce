"""Kernel unit tests: detection CC/boxes/ordering, CTC decode — checked
against hand-built arrays and the independent oracle implementations."""

import numpy as np

from openocr_spark.config import CHAR_TO_ID, NUM_CLASSES
from openocr_spark.fixtures import make_logits, payload_for_media_ref, _rng
from openocr_spark.kernels.detection import (
    connected_components,
    detect_boxes,
    sorted_boxes,
)
from openocr_spark.kernels.recognition import ctc_greedy_decode
from openocr_spark.oracle import _decode_loop, _flood_components


def test_connected_components_basic():
    m = np.zeros((10, 12), dtype=bool)
    m[1:4, 1:5] = True
    m[6:9, 7:11] = True
    comps = connected_components(m)
    assert sorted(comps) == [(1, 3, 1, 4), (6, 8, 7, 10)]


def test_connected_components_u_shape_merges():
    # two vertical arms joined at the bottom — union-find must merge
    m = np.zeros((8, 8), dtype=bool)
    m[0:6, 1] = True
    m[0:6, 5] = True
    m[5, 1:6] = True
    comps = connected_components(m)
    assert comps == [(0, 5, 1, 5)]


def test_cc_matches_oracle_flood_fill():
    for key in ["a", "b", "c", "d"]:
        rng = _rng(key)
        m = rng.random((40, 60)) > 0.6
        assert sorted(connected_components(m)) == sorted(_flood_components(m))


def test_detect_boxes_filters_and_unclip():
    prob = np.full((50, 80), 0.05, dtype=np.float32)
    prob[10:20, 10:40] = 0.9  # strong region
    prob[30:32, 50:52] = 0.9  # too small (min_size)
    prob[40:45, 10:30] = 0.25  # below binarize thresh
    boxes, scores = detect_boxes(prob)
    assert len(boxes) == 1
    assert scores[0] > 0.6
    (b,) = boxes
    # unclip expanded beyond the painted rect
    assert b[0][0] < 10 and b[0][1] < 10 and b[2][0] > 39 and b[2][1] > 19


def test_sorted_boxes_line_grouping():
    def q(x, y):
        return np.array([[x, y], [x + 10, y], [x + 10, y + 5], [x, y + 5]])

    # same line (y within 10), out of x order; plus a second line
    boxes = [q(50, 12), q(5, 8), q(30, 100)]
    out = sorted_boxes(boxes)
    assert [int(b[0][0]) for b in out] == [5, 50, 30]


def test_ctc_decode_dedup_and_blank():
    # frames: h h (blank) e l l(blank)l o  → "hello"
    ids = [
        CHAR_TO_ID["h"],
        CHAR_TO_ID["h"],
        0,
        CHAR_TO_ID["e"],
        CHAR_TO_ID["l"],
        CHAR_TO_ID["l"],
        0,
        CHAR_TO_ID["l"],
        CHAR_TO_ID["o"],
    ]
    logits = np.zeros((len(ids), NUM_CLASSES), dtype=np.float32)
    logits[np.arange(len(ids)), ids] = 8.0
    text, score = ctc_greedy_decode(logits)
    assert text == "hello"
    assert score > 0.9


def test_make_logits_roundtrip():
    rng = _rng("roundtrip")
    for word in ["spark", "hash join", "aggregate 42", "mississippi ss"]:
        lg = make_logits(word, rng)
        assert ctc_greedy_decode(lg)[0] == word
        assert _decode_loop(lg)[0] == word


def test_weak_logits_low_confidence():
    rng = _rng("weak")
    lg = make_logits("spark", rng, weak=True)
    _, score = ctc_greedy_decode(lg)
    assert score < 0.5


def test_payload_determinism():
    a = payload_for_media_ref("media://doc-1/0")
    b = payload_for_media_ref("media://doc-1/0")
    assert np.array_equal(a["score_map"], b["score_map"])
    assert [r["gt_text"] for r in a["regions"]] == [r["gt_text"] for r in b["regions"]]


def _onehot_rows(ids, vocab_size, peak=8.0):
    import numpy as np

    m = np.zeros((len(ids), vocab_size), dtype=np.float32)
    m[np.arange(len(ids)), ids] = peak
    return m


def test_nrtr_decode_breaks_at_eos_no_dedup():
    """NRTR-family: specials prepended (ids 0-3), break at </s> (id 3),
    NO adjacent-dup removal — 'aa' survives (unlike CTC)."""
    import numpy as np

    from openocr_spark.config import CHARSET
    from openocr_spark.kernels.recognition import NRTR_SPECIALS, nrtr_greedy_decode

    vocab = list(NRTR_SPECIALS) + list(CHARSET)
    a = vocab.index("a")
    b = vocab.index("b")
    text, conf = nrtr_greedy_decode(_onehot_rows([a, a, b, 3, b], len(vocab)))
    assert text == "aab"  # duplicate kept, content after </s> dropped
    assert 0.9 < conf <= 1.0


def test_srn_decode_skips_eos_and_keeps_tail():
    """SRN fixed-length quirk: EOS is in ignored_tokens so decoding
    SKIPS it and keeps later characters (srn_postprocess.py:34-41)."""
    from openocr_spark.config import CHARSET
    from openocr_spark.kernels.recognition import srn_fixed_decode

    vocab = list(CHARSET) + ["<BOS>", "<EOS>"]
    a = vocab.index("a")
    c = vocab.index("c")
    eos = len(vocab) - 1
    bos = len(vocab) - 2
    text, conf = srn_fixed_decode(_onehot_rows([bos, a, eos, c], len(vocab)))
    assert text == "ac"
    # fixed-length cap: only the first max_len positions are read
    text2, _ = srn_fixed_decode(_onehot_rows([a] * 30, len(vocab)), max_len=25)
    assert text2 == "a" * 25


def test_gtc_dual_head_decode():
    """GTC: guidance branch uses the NRTR head, CTC branch the greedy
    CTC head; only_gtc suppresses the second result."""
    import numpy as np

    from openocr_spark.config import CHARSET, CHAR_TO_ID
    from openocr_spark.kernels.recognition import NRTR_SPECIALS, gtc_decode

    vocab = list(NRTR_SPECIALS) + list(CHARSET)
    g = _onehot_rows([vocab.index("h"), vocab.index("i"), 3], len(vocab))
    # CTC: blank=0, dedup: h h <blank> i -> "hi"
    ctc_ids = [CHAR_TO_ID["h"], CHAR_TO_ID["h"], 0, CHAR_TO_ID["i"]]
    c = _onehot_rows(ctc_ids, len(CHARSET) + 1)
    (gt, gs), ctc = gtc_decode(g, c)
    assert gt == "hi" and ctc[0] == "hi"
    assert gs > 0.9 and ctc[1] > 0.9
    (gt2, _), none = gtc_decode(g, c, only_gtc=True)
    assert gt2 == "hi" and none is None
