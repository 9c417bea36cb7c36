"""BPE merge-rule learning: golden equivalence against a pure-Python
reference implementation, greedy-leftmost semantics, and determinism."""

from __future__ import annotations

from collections import Counter

from trafficbigdatasearch_spark.catalog import load_table
from trafficbigdatasearch_spark.operators import bpe

SF = "/root/testdata/sf0.001"


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Textbook BPE over (word, freq): count adjacent pairs weighted by
    freq, merge the (weight DESC, pair ASC) winner greedy-leftmost,
    repeat."""
    seqs = {w: [list(w), f] for w, f in word_freqs.items()}
    rules = []
    for r in range(n_merges):
        counts = Counter()
        for toks, f in seqs.values():
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] += f
        if not counts:
            break
        (a, b), w = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((r, a, b, w))
        for entry in seqs.values():
            toks = entry[0]
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            entry[0] = out
    return rules, seqs


def _word_freqs_py(rows):
    import re

    c = Counter()
    for (text,) in rows:
        for w in re.split(r"\s+", text.lower().strip()):
            if re.fullmatch(r"[a-z0-9]+", w):
                c[w] += 1
    return dict(c)


def test_learn_merges_matches_reference(spark):
    docs = load_table(spark, SF, "documents").limit(120)
    wf_py = _word_freqs_py([(r["text"],) for r in docs.select("text").collect()])
    want_rules, want_seqs = _ref_bpe(wf_py, 5)
    got_rules, got_reprs = bpe.learn_merges(docs, 5)
    assert got_rules == want_rules
    got_tokens = Counter()
    for r in bpe.token_counts(got_reprs).collect():
        got_tokens[r["token"]] = r["n"]
    want_tokens = Counter()
    for toks, f in want_seqs.values():
        for t in toks:
            want_tokens[t] += f
    assert got_tokens == want_tokens


def test_merge_is_greedy_leftmost(spark):
    """'aaa' under merge (a, a) must become aa + a, never a + aa."""
    docs = spark.createDataFrame([(1, "aaa aaa")], "doc_id bigint, text string")
    rules, reprs = bpe.learn_merges(docs, 1)
    assert [(r[1], r[2]) for r in rules] == [("a", "a")]
    assert [row["repr"] for row in reprs.collect()] == ["|aa||a|"]


def test_learn_merges_stops_when_exhausted(spark):
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id bigint, text string")
    rules, _ = bpe.learn_merges(docs, 10)
    assert [(r[1], r[2]) for r in rules] == [("a", "b")]  # then no pairs left


def test_batched_equals_sequential_on_tie_trap(spark):
    """The r9 batch guard's adversarial case: after merging the top pair
    (a,z), the NEW pair ("az","q") TIES at weight 70 with the disjoint
    pair (m,n) and wins the lexical tie-break ("az" < "m") — so a batch
    that accepted (m,n) alongside (a,z) would diverge from sequential
    BPE.  The strict weight > w_conf truncation must reject (m,n) in
    round 1 and pick ("az","q") in round 2, exactly like batch_size=1
    and the pure-Python reference."""
    words = {"azq": 70, "az": 30, "mn": 70}
    docs = spark.createDataFrame(
        [(i, " ".join([w] * f)) for i, (w, f) in enumerate(words.items())],
        "doc_id bigint, text string",
    )
    want_rules, _ = _ref_bpe(words, 3)
    seq_rules, _ = bpe.learn_merges(docs, 3, batch_size=1)
    bat_rules, bat_reprs = bpe.learn_merges(docs, 3, batch_size=8)
    assert seq_rules == want_rules
    assert bat_rules == want_rules
    assert [r[1] + r[2] for r in want_rules][:2] == ["az", "azq"]
    # and the final word table agrees
    seq_tokens = sorted(
        map(tuple, bpe.token_counts(bat_reprs).collect())
    )
    _, seq_reprs = bpe.learn_merges(docs, 3, batch_size=1)
    assert seq_tokens == sorted(
        map(tuple, bpe.token_counts(seq_reprs).collect())
    )


def test_batched_accepts_disjoint_prefix_in_one_round(spark):
    """When the ranking's head is pairwise-disjoint with strictly
    descending weights, one round must accept several merges (the whole
    point of batching) and still match the reference rule-for-rule."""
    words = {"ab": 90, "cd": 80, "ef": 70, "gh": 60}
    docs = spark.createDataFrame(
        [(i, " ".join([w] * f)) for i, (w, f) in enumerate(words.items())],
        "doc_id bigint, text string",
    )
    want_rules, _ = _ref_bpe(words, 4)
    got_rules, _ = bpe.learn_merges(docs, 4, batch_size=8)
    assert got_rules == want_rules and len(got_rules) == 4


def test_safe_batch_unit_cases():
    """_safe_batch edge semantics without a SparkSession: conflict stop,
    strict-weight truncation, conservative window bound, p1 always kept."""
    rows = lambda *t: [{"a": a, "b": b, "weight": w} for a, b, w in t]
    # conflict at w=70 truncates the tied disjoint pair but keeps w>70
    got = bpe._safe_batch(
        rows(("a", "z", 100), ("m", "n", 70), ("z", "q", 70)), remaining=0
    )
    assert got == [("a", "z", 100)]
    got = bpe._safe_batch(
        rows(("a", "z", 100), ("m", "n", 80), ("z", "q", 70)), remaining=0
    )
    assert got == [("a", "z", 100), ("m", "n", 80)]
    # no conflict, nothing beyond the window: accept everything
    got = bpe._safe_batch(rows(("a", "b", 9), ("c", "d", 9)), remaining=0)
    assert got == [("a", "b", 9), ("c", "d", 9)]
    # no conflict but pairs exist beyond the window: last weight bounds
    got = bpe._safe_batch(rows(("a", "b", 9), ("c", "d", 9)), remaining=1)
    assert got == [("a", "b", 9)]
    # p1 survives even when tied with its own conflict
    got = bpe._safe_batch(rows(("a", "b", 9), ("b", "c", 9)), remaining=0)
    assert got == [("a", "b", 9)]


def test_learn_merges_deterministic(spark):
    docs = load_table(spark, SF, "documents").limit(80)
    a, _ = bpe.learn_merges(docs, 4)
    b, _ = bpe.learn_merges(docs.repartition(13), 4)
    assert a == b


def test_apply_merges_matches_training_reprs(spark):
    """A word seen in training must encode EXACTLY as its final training
    repr — apply folds the same replaces in the same rank order."""
    docs = load_table(spark, SF, "documents").limit(120)
    rules, reprs = bpe.learn_merges(docs, 4)
    applied = bpe.apply_merges(docs.limit(120), rules)
    train = {
        row["repr"]: row["repr"]
        .strip("|")
        .replace("||", " ")
        for row in reprs.collect()
    }
    # rebuild each training word from its repr to key the comparison
    train_by_word = {k.replace("|", ""): v for k, v in train.items()}
    for row in applied.collect():
        assert row["encoded"] == train_by_word[row["word"]], row


def test_apply_merges_oov_degrades_to_chars(spark):
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id bigint, text string")
    rules, _ = bpe.learn_merges(docs, 1)  # learns (a, b)
    new = spark.createDataFrame([(9, "ab xyz")], "doc_id bigint, text string")
    got = {r["word"]: r["encoded"] for r in bpe.apply_merges(new, rules).collect()}
    assert got == {"ab": "ab", "xyz": "x y z"}


def test_apply_merges_rank_order_and_positions(spark):
    """Merges fold in rank order (rule 2 can consume rule 1's output) and
    pos tracks the pre-filter whitespace stream."""
    rules = [(0, "a", "b", 9), (1, "ab", "c", 5)]
    new = spark.createDataFrame(
        [(1, "abc  W!  abcabc")], "doc_id bigint, text string"
    )
    rows = sorted(
        (r["pos"], r["word"], r["encoded"])
        for r in bpe.apply_merges(new, rules).collect()
    )
    # 'W!' fails the [a-z0-9]+ contract but still occupies position 1
    assert rows == [
        (0, "abc", "abc"),
        (2, "abcabc", "abc abc"),
    ]


def test_apply_merges_memoized_equals_fold(spark):
    """The memo-join variant must be row-identical to the plain fold on a
    mixed known/OOV corpus — known words ride the training-table join, OOV
    words the replace chain."""
    docs = load_table(spark, SF, "documents").limit(100)
    rules, reprs = bpe.learn_merges(docs, 4)
    new = spark.createDataFrame(
        [(901, "unseenword zzz 42"), (902, "the a of")],
        "doc_id bigint, text string",
    ).unionByName(docs.select("doc_id", "text").limit(10))
    plain = sorted(map(tuple, bpe.apply_merges(new, rules).collect()))
    memo = sorted(
        map(tuple, bpe.apply_merges_memoized(new, rules, reprs).collect())
    )
    assert memo == plain
