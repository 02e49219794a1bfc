import math

import numpy as np
import pytest

from ee_outliers_ray.functions import (
    calculate_metric,
    flatten_fields_into_sentences,
    flatten_sentence,
    is_base64_encoded,
    is_hex_encoded,
    is_url,
    kl_divergence,
    match_ip_ranges,
    metric_column,
    replace_placeholder_fields_with_values,
    shannon_entropy,
)
from ee_outliers_ray.models.frontier import get_decision_frontier, is_outlier


def _ref_entropy(data):
    """Literal mirror of reference utils.py:113-127."""
    if not data:
        return 0
    entropy = 0
    for x in range(256):
        p_x = float(data.count(chr(x))) / len(data)
        if p_x > 0:
            entropy += -p_x * math.log(p_x, 2)
    return entropy


@pytest.mark.parametrize("s", ["houston", "", "aaaa", "abcABC123!@#",
                               "héllo wörld", "日本語 text", "a" * 1000])
def test_shannon_entropy_matches_reference(s):
    assert shannon_entropy(s) == pytest.approx(_ref_entropy(s), abs=1e-12)


def test_entropy_known_value():
    # reference docstring: entropy("houston") => 2.5216406363433186
    assert shannon_entropy("houston") == pytest.approx(2.5216406363433186)


def test_kl_divergence():
    assert kl_divergence("") == 0
    v = kl_divergence("google")
    assert isinstance(v, float) and v != 0


def test_base64_hex_url():
    assert is_base64_encoded("VGhpcyBpcyBhIHRleHQ=") == "This is a text"
    assert not is_base64_encoded("definitely not base64!!!")
    assert is_hex_encoded("5468697320697320612074657374")
    assert not is_hex_encoded("xyz")
    assert is_url("http://www.dance.com/")
    assert is_url("https://site0.example/p/1")
    assert not is_url("not a url")
    assert not is_url("www.nodscheme.com")


def test_match_ip_ranges():
    assert match_ip_ranges("192.168.1.5", ["192.168.0.0/16"])
    assert not match_ip_ranges("10.0.0.1", ["192.168.0.0/16"])
    assert not match_ip_ranges("garbage", ["192.168.0.0/16"])


def test_flatten_sentence():
    assert flatten_sentence("x") == "x"
    assert flatten_sentence(["a", "b"]) == "a - b"
    assert flatten_sentence([1, "b"]) == "1 - b"
    assert flatten_sentence([["nested"], "b"]) is None
    assert flatten_sentence({"d": 1}) is None
    assert flatten_sentence(None) is None


def test_flatten_fields_into_sentences():
    fields = {"hostname": ["A", "B"], "user": "u"}
    out = flatten_fields_into_sentences(fields, ["hostname", "user"])
    assert out == [["A", "u"], ["B", "u"]]


def test_placeholder():
    assert replace_placeholder_fields_with_values(
        "host {h} user {u}", {"h": "x", "u": ["a", "b"]}) == "host x user a, b"
    assert "not found" in replace_placeholder_fields_with_values("{missing}", {})


def test_metric_kernels():
    assert calculate_metric("numerical_value", "2")[0] == 2.0
    assert calculate_metric("numerical_value", "abc")[0] is None
    assert calculate_metric("length", "outliers")[0] == 8
    m, obs = calculate_metric("base64_encoded_length", "houston we have a cHJvYmxlbQ==")
    assert m == 7 and obs["max_base64_decoded_word"] == "problem"
    m, obs = calculate_metric("hex_encoded_length", "check 5468697320697320612074657374 out")
    assert m == 28
    m, obs = calculate_metric("url_length", "why don't we go http://www.dance.com")
    assert m == len("http://www.dance.com")
    assert calculate_metric("entropy", "houston")[0] == pytest.approx(2.5216406363433186)


def test_metric_column_vectorized():
    vals = np.array(["abc", "12", "qqqq"], dtype=object)
    out = metric_column("length", vals)
    assert list(out) == [3.0, 2.0, 4.0]
    out = metric_column("numerical_value", vals)
    assert np.isnan(out[0]) and out[1] == 12.0


# --- decision frontier (reference utils.py:308-443) --------------------------

def test_frontier_percentile_over_distinct():
    # reference computes over set(values): [0 5 10 20 30 2 5 5] -> distinct
    vals = [0, 5, 10, 20, 30, 2, 5, 5]
    want = np.percentile(sorted(set(vals)), 10)
    assert get_decision_frontier("percentile", vals, 10) == pytest.approx(want)


def test_frontier_pcts():
    vals = [1.0, 2.0, 3.0, 4.0]
    assert get_decision_frontier("pct_of_max_value", vals, 50) == pytest.approx(2.0)
    assert get_decision_frontier("pct_of_median_value", vals, 100) == pytest.approx(2.5)
    assert get_decision_frontier("pct_of_avg_value", vals, 100) == pytest.approx(2.5)
    assert get_decision_frontier("float", vals, 7.5) == 7.5


def test_frontier_stdev():
    vals = [1.0, 2.0, 3.0]
    assert get_decision_frontier("stdev", vals, 1, "high") == \
        pytest.approx(2.0 + np.std(vals))
    assert get_decision_frontier("stdev", vals, 1, "low") == \
        pytest.approx(2.0 - np.std(vals))


def test_frontier_mad_and_fallback():
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    mad = np.median(np.abs(np.array(vals) - np.median(vals)))
    assert get_decision_frontier("mad", vals, 2, "high") == \
        pytest.approx(np.median(vals) + 2 * mad)
    # MAD == 0 (more than half equal) -> stdev fallback with sensitivity 1
    vals = [5.0, 5.0, 5.0, 9.0]
    want = np.nanmean(vals) + 1 * np.std(vals)
    assert get_decision_frontier("mad", vals, 3, "high") == pytest.approx(want)
    # madpos clamps below zero
    vals = [5.0, 5.0, 5.0, 5.0]
    got = get_decision_frontier("madpos", vals, 1, "low")
    assert got >= 0


def test_frontier_cv():
    vals = [2.0, 4.0, 6.0]
    assert get_decision_frontier("coeff_of_variation", vals, 1) == \
        pytest.approx(np.std(vals) / np.mean(vals))


def test_is_outlier():
    assert is_outlier(5, 4, "high") and not is_outlier(3, 4, "high")
    assert is_outlier(3, 4, "low") and not is_outlier(5, 4, "low")
    v = is_outlier(np.array([1.0, 5.0]), 4, "high")
    assert list(v) == [False, True]


def test_pack_sequences_semantics():
    """First-fit-sequential packing: budget respected (except oversized
    docs, which get their own pack), deterministic per doc_id-range
    group regardless of input block layout."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ee_outliers_ray.textstats import pack_sequences

    texts = ["a " * n for n in [50, 60, 70, 200, 10, 10, 10, 300, 5]]
    tbl = pa.table({"doc_id": pa.array(range(9), type=pa.int64()),
                    "text": pa.array([t.strip() for t in texts])})
    out1 = pack_sequences(ray.data.from_arrow(tbl), max_tokens=128,
                          range_size=100).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # different block layout -> identical packs
    parts = [tbl.slice(0, 3), tbl.slice(3, 2), tbl.slice(5)]
    ds2 = ray.data.from_arrow_refs([__import__("ray").put(p) for p in parts])
    out2 = pack_sequences(ds2, max_tokens=128, range_size=100).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out1, out2)

    per_pack = out1.groupby("pack_id").agg(total=("n_tokens", "sum"),
                                           n=("n_tokens", "count"))
    for pid, row in per_pack.iterrows():
        if row["total"] > 128:
            assert row["n"] == 1  # only an oversized doc may exceed
    # expected layout: [50,60] [70] [200] [10,10,10] ... sequential
    assert out1["pack_id"].tolist()[:4] == [0, 0, 1, 2]


def test_repetition_scores_semantics():
    """Gopher-style repetition fractions on hand-computed docs, incl.
    the edge cases the kernel masks (empty text, single token, all-
    repeat doc)."""
    import pyarrow as pa
    import ray.data

    from ee_outliers_ray.textstats import repetition_scores

    docs = {
        0: "the cat sat on the mat",  # n=6 nd=5 top=2; 5 distinct bigrams
        1: "go go go go",             # n=4 nd=1 top=4; bigram (go,go)x3
        2: "",                        # no tokens -> all 0.0
        3: "hello",                   # one token -> no bigrams
        4: "a b a b a",               # n=5 nd=2 top=3; top bigram 2/4
    }
    tbl = pa.table({"doc_id": pa.array(sorted(docs), type=pa.int64()),
                    "text": pa.array([docs[k] for k in sorted(docs)])})
    out = repetition_scores(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = {
        0: (round(1 / 6, 6), round(2 / 6, 6), 0.2),
        1: (0.75, 1.0, 1.0),
        2: (0.0, 0.0, 0.0),
        3: (0.0, 1.0, 0.0),
        4: (0.6, 0.6, 0.5),
    }
    for _, r in out.iterrows():
        d, t, b = want[int(r["doc_id"])]
        assert r["dup_token_frac"] == pytest.approx(d, abs=1e-9)
        assert r["top_token_frac"] == pytest.approx(t, abs=1e-9)
        assert r["top_bigram_frac"] == pytest.approx(b, abs=1e-9)


def test_gopher_filter_gates():
    """Each gate of the fused quality filter drops exactly the doc
    built to violate it; the clean doc passes."""
    import pyarrow as pa
    import ray.data

    from ee_outliers_ray.textstats import gopher_filter

    uniq = " ".join(f"w{i}" for i in range(24))
    docs = [
        "too short",                      # n=2 < 20
        " ".join(["go"] * 30),            # dup 29/30 > 0.6, top 1.0
        uniq + " the",                    # 25 tokens, all gates pass
        uniq + " w24",                    # no stopword -> ratio 0 < 0.01
    ]
    tbl = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                    "text": pa.array(docs)})
    out = gopher_filter(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["keep"].tolist() == [0, 0, 1, 0]
    assert out["n_tokens"].tolist() == [2, 30, 25, 25]


def test_pii_scrub_semantics():
    """Counts are measured on the ORIGINAL text; redaction is the
    sequential EMAIL -> IP -> PHONE rewrite, so an IPv4 swallowed by an
    earlier email replacement still counts but is not tagged."""
    import pyarrow as pa
    import ray.data

    from ee_outliers_ray.textstats import pii_scrub

    docs = [
        "mail a@b.co or 1.2.3.4 call 555-123-4567",
        # the email pattern consumes the dotted-quad domain first: the
        # IPv4 count (on original text) is 1, but no <IP> tag survives
        "ping x@1.2.3.4.com now",
        "no pii here at all",
        "two mails a@b.co c@d.org and 10.0.0.1",
    ]
    tbl = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                    "text": pa.array(docs)})
    out = pii_scrub(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_emails"].tolist() == [1, 1, 0, 2]
    assert out["n_ipv4"].tolist() == [1, 1, 0, 1]
    assert out["n_phones"].tolist() == [1, 0, 0, 0]
    assert out["redacted"].tolist() == [
        "mail <EMAIL> or <IP> call <PHONE>",
        "ping <EMAIL> now",
        "no pii here at all",
        "two mails <EMAIL> <EMAIL> and <IP>",
    ]


def test_decontaminate_semantics():
    """Window matching is exact token-sequence containment; hits count
    DISTINCT benchmark n-grams; short docs and empty bench are safe."""
    import pyarrow as pa
    import pytest
    import ray.data

    from ee_outliers_ray.textstats import decontaminate

    g1 = "a b c"
    g2 = "c d e"
    docs = [
        "x a b c d e y",     # contains g1 (pos 2) and g2 (pos 4) -> 2
        "a b c a b c",       # g1 twice -> still 1 distinct hit
        "a b",               # shorter than n -> cannot match
        "b c a",             # tokens present, sequence absent -> 0
        "",                  # empty
    ]
    tbl = pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                    "text": pa.array(docs)})
    ds = ray.data.from_arrow(tbl)
    out = decontaminate(ds, [g1, g2], n=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_bench_hits"].tolist() == [2, 1, 0, 0, 0]
    assert out["contaminated"].tolist() == [1, 1, 0, 0, 0]

    empty = decontaminate(ds, [], n=3).to_pandas()
    assert empty["n_bench_hits"].sum() == 0

    with pytest.raises(ValueError, match="exactly 3 tokens"):
        decontaminate(ds, ["a b"], n=3)


def test_resample_by_weight_semantics():
    """floor(w) guaranteed copies + mix64-decided fractional copy;
    w <= 0 drops; copy indices are 0..n-1; fully deterministic."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ee_outliers_ray.hashing import mix64
    from ee_outliers_ray.textstats import resample_by_weight

    ids = np.arange(20, dtype=np.int64)
    w = np.array([0.0, 1.0, 2.5, 0.5, -1.0] * 4)
    tbl = pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
    ds = ray.data.from_arrow(tbl)
    out = resample_by_weight(ds, "w").to_pandas() \
        .sort_values(["doc_id", "copy"]).reset_index(drop=True)

    mx = mix64(ids.astype(np.uint64)).astype(np.float64)
    fl = np.floor(np.maximum(w, 0.0))
    frac = np.maximum(w, 0.0) - fl
    n_want = (fl + (mx < frac * 2.0 ** 64)).astype(np.int64)

    got_n = out.groupby("doc_id")["copy"].agg(["count", "min", "max"])
    for d in ids:
        n = int(n_want[d])
        if n == 0:
            assert d not in got_n.index
        else:
            assert got_n.loc[d, "count"] == n
            assert got_n.loc[d, "min"] == 0
            assert got_n.loc[d, "max"] == n - 1
    # w=1.0 rows always emit exactly one copy; w=0 and w<0 never emit
    assert all(n_want[ids % 5 == 1] == 1)
    assert all(n_want[ids % 5 == 0] == 0) and all(n_want[ids % 5 == 4] == 0)
    # at least one fractional accept and one reject across the w=2.5 rows
    ns = n_want[ids % 5 == 2]
    assert ns.min() == 2 and ns.max() == 3

    again = resample_by_weight(ds, "w").to_pandas() \
        .sort_values(["doc_id", "copy"]).reset_index(drop=True)
    assert out.equals(again)


def test_lm_perplexity_semantics():
    """Bigram-LM nll matches a pure-Python add-alpha reference on a
    hand-built corpus; pruning scores pruned bigrams as unseen; the
    model-size gate raises."""
    import math
    from collections import Counter

    import pyarrow as pa
    import pytest
    import ray.data

    from ee_outliers_ray.functions import duck_round
    from ee_outliers_ray.textstats import lm_perplexity

    docs = ["the cat sat", "the cat ran", "cat", "", "the the the"]
    tbl = pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                    "text": pa.array(docs)})
    ds = ray.data.from_arrow(tbl)

    def ref_nll(alpha, prune=1):
        toks = [d.split() for d in docs]
        uc = Counter(t for ts in toks for t in ts)
        bc = Counter((ts[i], ts[i + 1]) for ts in toks
                     for i in range(len(ts) - 1))
        bc = {k: v for k, v in bc.items() if v >= prune}
        v = len(uc)
        out = []
        for ts in toks:
            if len(ts) < 2:
                out.append(0.0)
                continue
            s = sum(math.log((bc.get((ts[i], ts[i + 1]), 0) + alpha)
                             / (uc[ts[i]] + alpha * v))
                    for i in range(len(ts) - 1))
            out.append(-s / (len(ts) - 1))
        return [float(duck_round(x, 6)) for x in out]

    got = lm_perplexity(ds, alpha=0.1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_tokens"].tolist() == [3, 3, 1, 0, 3]
    assert got["bigram_nll"].tolist() == ref_nll(0.1)

    pruned = lm_perplexity(ds, alpha=0.1, prune_min_count=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert pruned["bigram_nll"].tolist() == ref_nll(0.1, prune=2)
    # ('the','cat') survives (count 2); ('cat','sat') is pruned -> doc 0
    # scores strictly worse pruned than unpruned
    assert pruned["bigram_nll"][0] > got["bigram_nll"][0]

    with pytest.raises(ValueError, match="max_model_rows"):
        lm_perplexity(ds, max_model_rows=3)


def test_hash_split_fractions_and_determinism():
    import numpy as np

    from ee_outliers_ray import pipelines as P

    sf = "/root/testdata/sf0.01"
    a = P.hash_split(sf).to_pandas().sort_values("doc_id")
    b = P.hash_split(sf).to_pandas().sort_values("doc_id")
    assert (a["split"].to_numpy() == b["split"].to_numpy()).all()
    frac = (a["split"] == "train").mean()
    assert 0.7 < frac < 0.9  # 80% nominal
    s = P.hash_sample(sf, pct=20).to_pandas()
    assert 0.1 < len(s) / len(a) < 0.3
    assert set(s.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
