"""Hand-computed fixtures for the per-architecture decode heads
(VERDICT r2 item 3 + the remaining F1 variants): every head's
vocabulary layout, stop rule, skip rule, and confidence formula is
pinned against values computed by hand — no shared code with the
kernels under test.

Logit fixtures use a one-hot-times-10 convention: position t predicts
vocab id ids[t] with softmax probability p = e^10 / (e^10 + (V-1)) —
computed here independently."""

import math

import numpy as np
import pytest

from openocr_spark.kernels import decode_heads as H

CS = "ab"  # tiny charset for hand computation


def onehot_logits(ids, vocab_size, scale=10.0):
    out = np.zeros((len(ids), vocab_size), dtype=np.float64)
    for t, k in enumerate(ids):
        out[t, k] = scale
    return out


def p_top(vocab_size, scale=10.0):
    """softmax prob of the hot class in a one-hot-times-scale row."""
    return math.exp(scale) / (math.exp(scale) + (vocab_size - 1))


# --- ABINet / CPPD: vocab ['</s>', 'a', 'b'] --------------------------------


def test_abinet_eos_first_vocab_and_break():
    # ids: a, b, </s>, a  -> decode "ab", the trailing 'a' is after EOS
    lg = onehot_logits([1, 2, 0, 1], 3)
    text, conf = H.abinet_decode(lg, charset=CS)
    assert text == "ab"
    assert math.isclose(conf, p_top(3), rel_tol=1e-12)


def test_abinet_vision_fallback():
    lg = onehot_logits([2, 1, 0], 3)
    text, _ = H.abinet_decode(None, charset=CS, vision_logits=lg)
    assert text == "ba"


def test_abinet_no_duplicate_removal():
    # 'aa' stays 'aa' (AR head — unlike CTC)
    lg = onehot_logits([1, 1, 0], 3)
    assert H.abinet_decode(lg, charset=CS)[0] == "aa"


def test_cppd_reads_last_iteration():
    early = onehot_logits([2, 2, 0], 3)  # "bb"
    final = onehot_logits([1, 2, 0], 3)  # "ab"
    text, _ = H.cppd_decode([early, final], charset=CS)
    assert text == "ab"
    # bare array accepted too
    assert H.cppd_decode(final, charset=CS)[0] == "ab"


def test_abinet_out_of_range_id_skipped():
    lg = onehot_logits([1, 9, 2, 0], 10)  # id 9 > vocab size 3
    # build with 10 columns so argmax can hit 9; vocab is still 3 wide
    text, _ = H.abinet_decode(lg, charset=CS)
    assert text == "ab"


# --- SMTR: vocab ['</s>', 'a', 'b', '<s>', '<INF>', '<INB>', '<pad>'] -------


def test_smtr_skip_and_break_rules():
    # <s>, a, <pad>, b, </s>, a  -> "ab"
    lg = onehot_logits([3, 1, 6, 2, 0, 1], 7)
    text, conf = H.smtr_decode(lg, charset=CS)
    assert text == "ab"
    assert math.isclose(conf, p_top(7), rel_tol=1e-12)


def test_smtr_inf_inb_pass_through_literally():
    # faithful reference quirk: <INF>/<INB> are appended, not skipped
    lg = onehot_logits([1, 4, 0], 7)
    assert H.smtr_decode(lg, charset=CS)[0] == "a<INF>"
    lg2 = onehot_logits([1, 5, 0], 7)
    assert H.smtr_decode(lg2, charset=CS)[0] == "a<INB>"


def test_smtr_backward_mode_reverses():
    lg = onehot_logits([1, 2, 0], 7)  # forward "ab"
    assert H.smtr_decode(lg, charset=CS, next_mode=True)[0] == "ab"
    assert H.smtr_decode(lg, charset=CS, next_mode=False)[0] == "ba"


# --- LISTER: vocab ['</s>', 'a', 'b', '<pad>'] -------------------------------


def test_lister_pad_skipped_eos_breaks():
    lg = onehot_logits([1, 3, 2, 0, 1], 4)  # a, <pad>, b, </s>, a
    text, conf = H.lister_decode(lg, charset=CS)
    assert text == "ab"
    assert math.isclose(conf, p_top(4), rel_tol=1e-12)


# --- IGTR: vocab ['</s>', 'a', 'b', '<s>', '<pad>'] --------------------------


def test_igtr_decode_and_top5():
    lg = onehot_logits([1, 2, 0], 5)
    text, conf = H.igtr_decode(lg, charset=CS)
    assert text == "ab"
    t, c, top5 = H.igtr_decode(lg, charset=CS, with_top5=True)
    assert t == "ab" and len(top5) == 2
    # top-5 of 5 classes = the whole vocab; last entry is the argmax
    assert top5[0][-1] == "a" and top5[1][-1] == "b"
    assert all(len(cands) == 5 for cands in top5)


# --- CE: single-position classification over the bare charset ----------------


def test_ce_single_position():
    v = np.zeros(2)
    v[1] = 10.0
    text, conf = H.ce_decode(v, charset=CS)
    assert text == "b"
    assert math.isclose(conf, p_top(2), rel_tol=1e-12)


# --- VisionLAN: 1-based ids, geometric-mean confidence -----------------------


def test_visionlan_one_based_ids_and_geometric_conf():
    # vocab 'ab'; class ids: 1->'a', 2->'b', 0 -> ''
    lg = onehot_logits([1, 2, 0], 3)
    text, conf = H.visionlan_decode(lg, length=3, charset=CS)
    assert text == "ab"  # the id-0 position decodes to empty string
    p = p_top(3)
    want = math.exp(3 * math.log(p) / (3 + 1e-6))
    assert math.isclose(conf, want, rel_tol=1e-9)


def test_visionlan_length_slices_positions():
    lg = onehot_logits([1, 2, 2, 2], 3)
    assert H.visionlan_decode(lg, length=2, charset=CS)[0] == "ab"


# --- MGP char head: BOS slot dropped, product conf incl. EOS -----------------


def test_mgp_char_decode_product_confidence_includes_eos():
    # vocab ['[GO]','[s]','a','b']; raw positions: BOS slot, a, b, [s]
    lg = onehot_logits([0, 2, 3, 1], 4)
    text, conf = H.mgp_char_decode(lg, charset=CS)
    assert text == "ab"
    p = p_top(4)
    assert math.isclose(conf, p ** 3, rel_tol=1e-12)  # a, b AND the EOS position


def test_mgp_char_go_skipped():
    lg = onehot_logits([0, 2, 0, 3, 1], 4)  # BOS, a, [GO], b, [s]
    text, conf = H.mgp_char_decode(lg, charset=CS)
    assert text == "ab"
    p = p_top(4)
    assert math.isclose(conf, p ** 4, rel_tol=1e-12)  # [GO] prob still multiplied


def test_mgp_fusion_strictly_greater_wins():
    assert H.mgp_fuse(("c", 0.5), ("b", 0.5), ("w", 0.5)) == ("c", 0.5)
    assert H.mgp_fuse(("c", 0.4), ("b", 0.6), ("w", 0.5)) == ("b", 0.6)
    assert H.mgp_fuse(("c", 0.4), ("b", 0.6), ("w", 0.7)) == ("w", 0.7)


# --- char dual head -----------------------------------------------------------


def test_char_dual_decode_offset_branch():
    # main vocab ['blank','<unk>','<s>','</s>','a','b']
    text_lg = onehot_logits([4, 5, 3], 6)  # a, b, </s>
    # char branch: argmax over charset-only logits, +4 offset
    char_lg = onehot_logits([1, 0, 0], 2)  # b, a, a
    (text, conf), (box, box_conf) = H.char_dual_decode(text_lg, char_lg, charset=CS)
    assert text == "ab" and box == "ba"
    assert math.isclose(conf, p_top(6), rel_tol=1e-12)
    assert math.isclose(box_conf, p_top(2), rel_tol=1e-12)


# --- tokenizer-backed heads -----------------------------------------------------


def test_unirec_clean_special_tokens_rules():
    f = H.unirec_clean_special_tokens
    assert f("Ġhello") == " hello"
    assert f("a-<|sn|>b") == "ab"
    assert f("a <|sn|>b") == "a b"
    assert f("a<|sn|>b") == "a b"
    assert f("<s>x</s>") == "x"
    assert f("_____") == "___"
    assert f("x.....y") == "x...y"
    assert f("<|bos|>hi<|eos|><|pad|>") == "hi"


def test_unirec_decode_with_token_map():
    id_to_token = {0: "<|bos|>", 1: "Ġhello", 2: "world", 3: "<|eos|>"}
    text, conf = H.unirec_decode([0, 1, 2, 3], id_to_token)
    assert text == " helloworld"
    assert conf == 0.0


def test_cmer_decode_strips_specials_and_spaces():
    id_to_token = {0: "<|bos|>", 1: "x ", 2: "+", 3: " y", 4: "<|eos|>"}
    text, conf = H.cmer_decode([0, 1, 2, 3, 4], id_to_token)
    assert text == "x+y"
    assert conf == 0.0


# --- empty-input contracts ------------------------------------------------------


@pytest.mark.parametrize(
    "fn",
    [
        lambda: H.abinet_decode(np.zeros((0, 3)), charset=CS),
        lambda: H.cppd_decode(np.zeros((0, 3)), charset=CS),
        lambda: H.smtr_decode(np.zeros((0, 7)), charset=CS),
        lambda: H.lister_decode(np.zeros((0, 4)), charset=CS),
        lambda: H.igtr_decode(np.zeros((0, 5)), charset=CS),
        lambda: H.visionlan_decode(np.zeros((0, 3)), charset=CS),
    ],
)
def test_empty_logits_decode_empty(fn):
    text, conf = fn()[:2]
    assert text == "" and conf == 0.0


def test_eos_at_position_zero_yields_empty():
    lg = onehot_logits([0], 3)
    assert H.abinet_decode(lg, charset=CS) == ("", 0.0)


# --- randomized equivalence vs the independent oracle derivation -------------


def test_heads_match_oracle_on_random_logits():
    """Property check: the decode-head kernels and the independent
    oracle derivation (oracle.rec_heads_rows' eos_family / visionlan /
    mgp logic) agree on random logits over the REAL charset — the same
    cross-check the driver runs on fixture regions, here on adversarial
    random inputs including early EOS and ties."""
    import numpy as np

    from openocr_spark.config import CHARSET
    from openocr_spark.kernels.recognition import ctc_greedy_decode

    rng = np.random.RandomState(42)
    for trial in range(25):
        T = int(rng.randint(1, 30))
        V = 38  # fixture logit width
        lg = rng.randn(T, V) * 3.0

        def softmax_rows(x):
            e = np.exp(x - x.max(axis=1, keepdims=True))
            return e / e.sum(axis=1, keepdims=True)

        pr = softmax_rows(lg.astype(np.float64))
        ids, conf = pr.argmax(axis=1), pr.max(axis=1)

        def eos_family(vocab, skip):
            kept = []
            for k, c in zip(ids, conf):
                k = int(k)
                if k >= len(vocab):
                    continue
                if vocab[k] == "</s>":
                    break
                if vocab[k] in skip:
                    continue
                kept.append((vocab[k], float(c)))
            if not kept:
                return "", 0.0
            return "".join(t for t, _ in kept), float(np.mean([c for _, c in kept]))

        cs = list(CHARSET)
        assert H.abinet_decode(lg) == eos_family(["</s>"] + cs, set())
        assert H.smtr_decode(lg) == eos_family(
            ["</s>"] + cs + ["<s>", "<INF>", "<INB>", "<pad>"], {"<s>", "<pad>"}
        )
        assert H.lister_decode(lg) == eos_family(
            ["</s>"] + cs + ["<pad>"], {"<s>", "<pad>"}
        )
        assert H.igtr_decode(lg) == eos_family(
            ["</s>"] + cs + ["<s>", "<pad>"], {"<s>", "<pad>"}
        )
        # visionlan: 1-based ids + geometric conf
        vl_text = "".join(
            cs[int(k) - 1] if 0 < int(k) <= len(cs) else "" for k in ids
        )
        vl_conf = float(np.exp(np.log(np.maximum(conf, 1e-300)).sum() / (len(conf) + 1e-6)))
        got_t, got_c = H.visionlan_decode(lg)
        assert got_t == vl_text and abs(got_c - vl_conf) < 1e-12
        # ctc: lag-dedup + blank drop
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = ids[1:] != ids[:-1]
        keep &= ids != 0
        want_text = "".join(cs[k - 1] for k in ids[keep] if 1 <= k <= len(cs))
        want_conf = float(conf[keep].mean()) if keep.any() else 0.0
        got_t, got_c = ctc_greedy_decode(lg)
        assert got_t == want_text and abs(got_c - want_conf) < 1e-12


def test_mgp_bpe_break_and_product_conf():
    """mgp_postprocess.py:105-119: '#' breaks BEFORE appending or
    multiplying; conf is the product of kept positions; immediate '#'
    keeps the initial 1.0."""
    from openocr_spark.kernels.decode_heads import mgp_bpe_decode

    tm = {1: "ab", 2: "cd", 9: "#", 3: "ef"}
    text, conf = mgp_bpe_decode([1, 2, 9, 3], [0.5, 0.25, 0.9, 0.8], tm)
    assert text == "abcd"
    assert abs(conf - 0.125) < 1e-12  # 0.5 * 0.25; '#' prob excluded
    text, conf = mgp_bpe_decode([9, 1], [0.7, 0.7], tm)
    assert (text, conf) == ("", 1.0)  # the reference's empty-product quirk
    # unknown ids decode to '' and contribute their prob
    text, conf = mgp_bpe_decode([1, 77], [0.5, 0.5], tm)
    assert text == "ab" and abs(conf - 0.25) < 1e-12


def test_mgp_wp_sep_truncation_and_conf_window():
    """mgp_postprocess.py:121-143: string truncates at find('[SEP]');
    conf = product of probs[:index(sep_id)+1] (INCLUDING the [SEP]
    position); absent [SEP] → find()=-1 drops the last char and the
    window is probs[:-1]; empty window → 0.0."""
    from openocr_spark.kernels.decode_heads import mgp_wp_decode, wp_join

    tm = {1: "hello", 2: "##wo", 3: "rld", 10: "[SEP]", 4: "x"}
    # wp_join: '##' merges into the previous token
    assert wp_join(["hello", "##wo", "rld"]) == "hellowo rld"
    text, conf = mgp_wp_decode(
        [1, 2, 10, 4], [0.5, 0.5, 0.5, 0.9], tm, sep_id=10
    )
    # joined: 'hellowo [SEP] x' → truncated at '[SEP]' → 'hellowo '
    assert text == "hellowo "
    assert abs(conf - 0.125) < 1e-12  # 0.5*0.5*0.5 — [SEP] included
    # no [SEP]: find()=-1 slices the last char off; window probs[:-1]
    text, conf = mgp_wp_decode([1, 3], [0.5, 0.25], tm, sep_id=10)
    assert text == "hello rl"  # 'hello rld'[: -1]
    assert abs(conf - 0.5) < 1e-12
    # single token without [SEP]: empty conf window → 0.0
    text, conf = mgp_wp_decode([1], [0.5], tm, sep_id=10)
    assert (text, conf) == ("hell", 0.0)  # 'hello'[:-1], cumprod-empty path


def test_fixture_token_map_contract():
    """One token per logit column, specials present, JSON round-trip."""
    import json

    from openocr_spark.config import NUM_CLASSES
    from openocr_spark.kernels.tokenizer import (
        fixture_token_map,
        sep_id,
        token_map_json,
    )

    tm = fixture_token_map()
    assert len(tm) == NUM_CLASSES
    assert len({i for i, _ in tm}) == NUM_CLASSES
    toks = {t for _, t in tm}
    assert {"<|pad|>", "#", "[SEP]", "<|eos|>"} <= toks
    assert sep_id(tm) == 10
    rt = tuple(sorted((int(k), v) for k, v in json.loads(token_map_json()).items()))
    assert rt == tuple(sorted(tm))
