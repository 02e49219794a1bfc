"""word2vec analyzer parity tests: probability-model exactness (incl.
the reference's +1 counting quirk), geo/arith mean switching, trigger
focus word|text, config-surface acceptance of the reference example
conf, and seeded determinism of the neural path."""

import math
import os

import numpy as np
import pandas as pd
import pytest
import ray.data

from ee_outliers_ray.models.word2vec import (
    GroupWord2Vec,
    W2VSettings,
    split_text_by_separator,
    word2vec_model,
)

REF_CONF = ("/root/reference/use_cases/examples/"
            "word2vec_suspicious_process_directory.conf")


def test_split_by_separator():
    assert split_text_by_separator("a b c", " ") == ["a", "b", "c"]
    assert split_text_by_separator("a/b\\c", r"[/\\]") == ["a", "b", "c"]
    assert split_text_by_separator("abc", "") == ["a", "b", "c"]


def test_prob_model_reference_quirk_exact():
    """P(context|center) replicates the reference's init-at-1-then-
    increment counting (ml_models/word2vec.py:237-250)."""
    s = W2VSettings(use_prob_model=True, output_prob=True, size_window=1,
                    trigger_focus="text", trigger_score="mean")
    m = GroupWord2Vec(s)
    data = ["a b", "a b"]
    m.prepare(data)
    out = m.prob_model_outputs(data)
    # pairs per text: (a->b), (b->a); texts x2 => each pair twice
    # reference counts: pair_count = 1 + occurrences = 3;
    # center_total = 1 + center pair count = 3  => prob = 1.0
    assert all(abs(row[5] - 1.0) < 1e-12 for row in out)

    data2 = ["a b c"]
    m2 = GroupWord2Vec(W2VSettings(use_prob_model=True, size_window=2,
                                   trigger_focus="text",
                                   trigger_score="mean"))
    m2.prepare(data2)
    out2 = m2.prob_model_outputs(data2)
    # center 'a' has contexts b, c once each: counts {b:2, c:2}, total 3
    probs_a = [row[5] for row in out2 if row[1] == m2.word2id["a"]]
    assert probs_a == pytest.approx([2 / 3, 2 / 3])


def test_log_prob_when_output_prob_off():
    s = W2VSettings(use_prob_model=True, output_prob=False, size_window=1,
                    trigger_focus="text", trigger_score="mean")
    m = GroupWord2Vec(s)
    data = ["a b", "a b"]
    m.prepare(data)
    out = m.prob_model_outputs(data)
    assert all(abs(row[5] - math.log(1.0)) < 1e-12 for row in out)
    assert not s.use_geo_mean  # use_geo_mean tracks output_prob


def test_geo_mean_vs_arith_mean_scoring():
    data = ["x y", "x y", "x z"]
    s = W2VSettings(use_prob_model=True, output_prob=True, size_window=1,
                    trigger_focus="text", trigger_score="mean",
                    trigger_method="pct_of_avg_value",
                    trigger_sensitivity=99, trigger_on="low")
    m = GroupWord2Vec(s)
    m.prepare(data)
    res = m.find_outliers(data)
    assert len(res) == 3
    # text 2 ('x z') contains the rare pair -> lowest mean score
    scores = {r["text_idx"]: r["score"] for r in res}
    assert scores[2] == min(scores.values())


def test_trigger_focus_word_with_window_guard():
    """A word flagged only when outlier AND seen in >1 distinct window
    compositions (reference word2vec.py:818)."""
    data = ["a b c", "a b c", "a b c", "a q c"]
    s = W2VSettings(use_prob_model=True, output_prob=True, size_window=1,
                    trigger_focus="word", trigger_score="center",
                    trigger_method="pct_of_avg_value",
                    trigger_sensitivity=90, trigger_on="low")
    m = GroupWord2Vec(s)
    m.prepare(data)
    res = m.find_outliers(data)
    flagged = [r for r in res if r["is_outlier"]]
    # only the 'a q c' text can trigger; its observations carry the word
    assert all(r["text_idx"] == 3 for r in flagged)
    if flagged:
        obs = flagged[0]["observations"]
        assert obs["score_type"] == "center"
        assert "expected_window_words" in obs


def test_word2vec_model_golden_seeded():
    """Pinned outputs for the prob-model path over a fixed corpus —
    guards scoring semantics against regressions."""
    rows = []
    normal = ["open file read", "open file write", "read file close",
              "open read close"]
    for i in range(20):
        rows.append({"doc_id": i, "agg": "A", "cmd": normal[i % len(normal)]})
    rows.append({"doc_id": 99, "agg": "A", "cmd": "zz qq xx yy ww vv"})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = word2vec_model(ds, "agg", "cmd", trigger_method="stdev",
                         trigger_sensitivity=1, trigger_on="low").to_pandas()
    out2 = word2vec_model(ds, "agg", "cmd", trigger_method="stdev",
                          trigger_sensitivity=1, trigger_on="low").to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    assert np.allclose(np.sort(out["w2v_score"].to_numpy()),
                       np.sort(out2["w2v_score"].to_numpy()))
    assert 99 in set(out["doc_id"])
    assert out[out["doc_id"] == 99]["w2v_score"].iloc[0] == \
        out["w2v_score"].min()


def test_neural_path_deterministic_and_sane():
    data = ["open file read", "open file write", "zz qq xx"] * 3
    s = W2VSettings(use_prob_model=False, output_prob=True, size_window=2,
                    num_epochs=2, learning_rate=0.05, embedding_size=8,
                    seed=7, trigger_focus="text", trigger_score="mean",
                    trigger_method="stdev", trigger_sensitivity=1,
                    trigger_on="low")
    m1, m2 = GroupWord2Vec(s), GroupWord2Vec(s)
    m1.prepare(data)
    m2.prepare(data)
    r1 = m1.find_outliers(data)
    r2 = m2.find_outliers(data)
    assert [x["score"] for x in r1] == [x["score"] for x in r2]
    # softmax probabilities in (0, 1)
    assert all(0.0 < x["score"] < 1.0 for x in r1)


def test_min_target_buckets_and_drop_duplicates():
    rows = [{"doc_id": i, "agg": "A", "cmd": "a b"} for i in range(4)]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = word2vec_model(ds, "agg", "cmd", min_target_buckets=10,
                         trigger_method="stdev", trigger_sensitivity=1,
                         trigger_on="low").to_pandas()
    assert len(out) == 0  # under-filled bucket skipped
    out2 = word2vec_model(ds, "agg", "cmd", drop_duplicates=True,
                          trigger_method="pct_of_avg_value",
                          trigger_sensitivity=101, trigger_on="low",
                          trigger_focus="text",
                          trigger_score="mean").to_pandas()
    # after dedup one sentence remains; pct_of_avg 101 low flags it
    assert len(out2) <= 1


@pytest.mark.skipif(not os.path.exists(REF_CONF),
                    reason="reference conf not available")
def test_reference_example_conf_accepted(tmp_path):
    """The config frontend parses the reference's word2vec example conf
    and compiles a runnable plan (word2vec_suspicious_process_directory:
    separators='\\\\', trigger_focus=word, trigger_score=center,
    use_prob_model=0, seed=43)."""
    from ee_outliers_ray.models.config import load_use_cases, run_model

    cfgs = load_use_cases(REF_CONF)
    assert len(cfgs) == 1
    cfg = cfgs[0]
    assert cfg.model_type == "word2vec"
    assert cfg.get("trigger_focus") == "word"
    assert cfg.get("use_prob_model", cast=bool) is False
    assert cfg.get("seed", cast=int) == 43

    # smoke-run the compiled plan on a table with the conf's columns
    # (windows-style process paths split on backslash)
    rows = []
    for i in range(8):
        rows.append({"WevtFilter.Image": r"C:\Windows\System32\svchost.exe",
                     "meta.logged_in_users": "alice"})
    rows.append({"WevtFilter.Image": r"C:\Temp\evil.exe",
                 "meta.logged_in_users": "alice"})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    # min_target_buckets in the conf is 3000 -> our 9 rows are skipped,
    # which is itself the correct reference behavior
    out = run_model(cfg, ds).to_pandas()
    assert len(out) == 0


def test_confusion_matrix_parity():
    """TP/FP/FN/TN counting + precision/recall/F mirror the reference
    (word2vec.py:640-699)."""
    from ee_outliers_ray.models.word2vec import confusion_matrix

    results = [{"text_idx": 0, "is_outlier": True},
               {"text_idx": 1, "is_outlier": False},
               {"text_idx": 2, "is_outlier": True},
               {"text_idx": 3, "is_outlier": False}]
    labels = [1, 1, 0, 0]  # text0 true outlier found, text1 missed,
    #                        text2 false alarm, text3 true negative
    cm = confusion_matrix(results, labels)
    assert (cm["TP"], cm["FN"], cm["FP"], cm["TN"]) == (1, 1, 1, 1)
    assert cm["precision"] == 0.5 and cm["recall"] == 0.5
    assert abs(cm["f_measure"] - 0.5) < 1e-12
    # degenerate cases mirror the reference's None handling
    cm2 = confusion_matrix([], [0, 0])
    assert cm2["recall"] is None and cm2["precision"] is None


def test_neural_path_golden_seeded():
    """Pinned end-to-end scores for the numpy Adam+CE neural clone
    (VERDICT r2 item 7): refactors must not silently shift the
    distribution-parity model.  Regenerate the literals ONLY for a
    deliberate, documented model change."""
    data = ["open file read", "open file write", "read file close",
            "zz qq xx", "open read close"] * 2
    s = W2VSettings(use_prob_model=False, output_prob=True, size_window=2,
                    num_epochs=2, learning_rate=0.05, embedding_size=8,
                    seed=7, trigger_focus="text", trigger_score="mean",
                    trigger_method="stdev", trigger_sensitivity=1,
                    trigger_on="low")
    m = GroupWord2Vec(s)
    m.prepare(data)
    got = [round(x["score"], 12) for x in m.find_outliers(data)]
    golden = [0.272100379165, 0.16134081959, 0.223545346686,
              0.194498674422, 0.220967788514] * 2
    assert got == golden
