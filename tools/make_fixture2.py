#!/usr/bin/env python3
"""Second-fixture robustness gate (round-8 verdict item 2).

Builds a PERTURBED copy of a testdata scale dir in an output dir, then
`graft.Verify` + `tools/check.py` run against it exactly like the main
gate — the DuckDB oracle reads the same perturbed parquet, so every
oracle-gated query must still hash-match. The perturbations target the
documented data assumptions the seed-42 fixture never exercises:

  * global row-order shuffle of every table (order-independence —
    seed 1337 permutation);
  * HOT KEYS: one user's events replicated 20x (new event_ids, ts
    nudged +1..+20 us), one customer's orders replicated 30x (new
    orderkeys);
  * duplicate (l_orderkey, l_linenumber) pairs at small SF (the sf0.1
    hazard: order-by-non-unique-prefix bugs) by replicating one part's
    lineitems verbatim;
  * EMPTY GROUP: all customers of nation 7 removed (their orders
    remain — referential-violation counts move on both sides equally);
  * PLANTED NULLS: ~1% of events.value set NULL (nullable measure in
    aggregation/order paths);
  * EMPTY STRINGS: 3 documents with text='' and n_chars=0 (tokenizer /
    shingle edge);
  * EXACT TIE: vec 0's embedding duplicated under a new vec_id with a
    different label (cos=1.0 ties exercise the (metric, id) total
    orders);
  * round 10 — EXACT-DUPLICATE DOC PAIR (a real dedup cluster beyond
    the planted +offset copies: jaccard 1.0, equal lengths → the q232
    rep tie-break), DEGENERATE SHINGLE LENGTHS (a 1-word and a 2-word
    doc exercise the whole-text-shingle fallback), a SAME-WORD RUN doc
    (the BPE leftmost-greedy even-offset rule on real data), and
    BUCKET-BOUNDARY PRICES (o_totalprice exactly on 30000-multiples —
    the q242 floor-before-cast boundary);
  * round 11 — UNICODE HAZARDS: astral-plane emoji words (surrogate
    pairs in UTF-16 engines), a ZWJ emoji sequence as one word, CJK
    words with a repeat, and combining-mark + embedded-ZWJ words —
    the codepoint-vs-code-unit divergence class for every
    char-indexed path (BPE char split, char-class profiles,
    levenshtein, normalization regexes).

  * round 13 — PERCEPTUAL-HASH COLLISION: a long doc pair differing
    only by an adjacent-letter swap inside one 63-chunk — different
    byte digests (qm5 must not pair) but identical code-point chunk
    sums (qm6 phash collides, qm7 banding must emit the pair at
    Hamming 0);

  * round 16 — TWO-SCALE COMMUNITY: two disconnected blocks of three
    bridged supplier 4-cliques planted into the co-supply stream
    (fresh supplier/part/order keys), sized so the q311 two-level
    Louvain gate performs REAL contracted-level merges on perturbed
    data (level 1 provably cannot merge the cliques; level 2 must).

Usage: python3 tools/make_fixture2.py SRC_DIR OUT_DIR
e.g.:  python3 tools/make_fixture2.py /root/testdata/sf0.001 /tmp/fixture2
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def shuffle(table: pa.Table, rng: np.random.RandomState) -> pa.Table:
    idx = rng.permutation(table.num_rows)
    return table.take(pa.array(idx))


def main(src: str, out: str) -> None:
    rng = np.random.RandomState(1337)
    os.makedirs(out, exist_ok=True)
    tabs = {t: pq.read_table(os.path.join(src, f"{t}.parquet"))
            for t in TABLES}

    # customer: drop nation 7 (empty group)
    cust = tabs["customer"]
    keep = pa.compute.not_equal(cust["c_nationkey"], pa.scalar(7, pa.int32()))
    tabs["customer"] = cust.filter(keep)

    # orders: replicate one customer's orders 30x with fresh orderkeys
    orders = tabs["orders"]
    hot_cust = orders["o_custkey"][0].as_py()
    hot = orders.filter(pa.compute.equal(orders["o_custkey"], hot_cust))
    max_ok = pa.compute.max(orders["o_orderkey"]).as_py()
    extra = []
    next_ok = max_ok + 1
    for rep in range(30):
        block = hot.to_pydict()
        n = len(block["o_orderkey"])
        block["o_orderkey"] = list(range(next_ok, next_ok + n))
        next_ok += n
        extra.append(pa.Table.from_pydict(block, schema=orders.schema))
    tabs["orders"] = pa.concat_tables([orders] + extra)

    # lineitem: replicate one part's rows VERBATIM (duplicate
    # (l_orderkey, l_linenumber) pairs — the sf0.1 hazard)
    li = tabs["lineitem"]
    hot_part = li["l_partkey"][0].as_py()
    dup = li.filter(pa.compute.equal(li["l_partkey"], hot_part))
    li = pa.concat_tables([li, dup])
    # round-16 hazard: TWO-SCALE COMMUNITY in the co-supply graph
    # (q311's substrate). Two disconnected blocks of fresh suppliers,
    # each = three 4-cliques (each clique's 4 suppliers share 30
    # common parts -> all 6 pairs pass the >=25 threshold) bridged in
    # a triangle by SINGLE supplier pairs sharing 25 parts, plus 25
    # isolated co-supplying filler PAIRS that raise the graph's total
    # edge count. One synchronous Louvain level provably keeps the
    # cliques separate (stay-score 6m-24 > cross-bridge 2m-40 for any
    # m); the contracted level merges a block's cliques iff
    # 2m > k*tot = 14*14 = 196 -- the fillers push m to
    # 45 + 42 + 25 = 112 (2m = 224 > 196, merge gain +28; merged-
    # block modularity gain 12m - 1176 = +168), so the q311 gate
    # exercises REAL, modularity-POSITIVE level-2 merges on perturbed
    # data while level 1 provably cannot make them. Fresh supplier/
    # part/order keys keep every original query recomputable
    # identically on both engines.
    tmpl = {k: v[0] for k, v in li.slice(0, 1).to_pydict().items()}
    max_sk = pa.compute.max(li["l_suppkey"]).as_py()
    max_pk = pa.compute.max(li["l_partkey"]).as_py()
    max_ok2 = pa.compute.max(li["l_orderkey"]).as_py()
    sk0, pk0, ok0 = max_sk + 1, max_pk + 1, max_ok2 + 1
    rows = {k: [] for k in li.column_names}

    def add_row(part, supp):
        nonlocal ok0
        for k in li.column_names:
            rows[k].append(tmpl[k])
        rows["l_partkey"][-1] = part
        rows["l_suppkey"][-1] = supp
        rows["l_orderkey"][-1] = ok0
        rows["l_linenumber"][-1] = 1
        ok0 += 1

    for blk in range(2):
        supp = [sk0 + blk * 12 + i for i in range(12)]
        cl = [supp[0:4], supp[4:8], supp[8:12]]
        for c in cl:
            for _ in range(30):
                for s in c:
                    add_row(pk0, s)
                pk0 += 1
        # one bridge per clique pair (triangle), distinct endpoints
        bridges = [(cl[0][0], cl[1][0]), (cl[1][1], cl[2][1]),
                   (cl[2][0], cl[0][1])]
        for (a, b) in bridges:
            for _ in range(25):
                add_row(pk0, a)
                add_row(pk0, b)
                pk0 += 1
    # 25 isolated filler pairs (suppliers sk0+24 ... sk0+73)
    for p in range(25):
        a, b = sk0 + 24 + 2 * p, sk0 + 25 + 2 * p
        for _ in range(25):
            add_row(pk0, a)
            add_row(pk0, b)
            pk0 += 1
    planted = pa.Table.from_pydict(rows, schema=li.schema)
    tabs["lineitem"] = pa.concat_tables([li, planted])

    # events: hot user 20x + ~1% NULL value
    ev = tabs["events"]
    hot_user = ev["user_id"][0].as_py()
    he = ev.filter(pa.compute.equal(ev["user_id"], hot_user))
    max_eid = pa.compute.max(ev["event_id"]).as_py()
    next_eid = max_eid + 1
    eextra = []
    for rep in range(20):
        block = he.to_pydict()
        n = len(block["event_id"])
        block["event_id"] = list(range(next_eid, next_eid + n))
        next_eid += n
        block["ts"] = [t + np.timedelta64(rep + 1, "us") for t in
                       he["ts"].to_numpy(zero_copy_only=False)]
        eextra.append(pa.Table.from_pydict(block, schema=ev.schema))
    ev = pa.concat_tables([ev] + eextra)
    vals = ev["value"].to_numpy(zero_copy_only=False).copy()
    null_idx = rng.choice(len(vals), size=max(1, len(vals) // 100),
                          replace=False)
    mask = np.zeros(len(vals), dtype=bool)
    mask[null_idx] = True
    val_arr = pa.array(vals, mask=mask, type=pa.float64())
    ev = ev.set_column(ev.schema.get_field_index("value"), "value",
                       val_arr)
    tabs["events"] = ev

    # documents: 3 empty texts (n_chars consistent)
    docs = tabs["documents"].to_pydict()
    for i in range(min(3, len(docs["doc_id"]))):
        docs["text"][i] = ""
        docs["n_chars"][i] = 0
    # round-10 hazards (positions 5..11, past the empty-text block):
    # exact-duplicate pair, 1-word / 2-word docs, same-word run
    if len(docs["doc_id"]) >= 12:
        docs["text"][5] = "spark"
        docs["text"][6] = "spark join"
        docs["text"][7] = "dup dup dup dup dup dup dup"
        docs["text"][11] = docs["text"][10]
        for i in (5, 6, 7, 11):
            docs["n_chars"][i] = len(docs["text"][i])
    # round-11 hazards: UNICODE — astral-plane codepoints (surrogate
    # pairs in UTF-16 engines), a ZWJ emoji sequence as one "word",
    # CJK words (incl. a repeated one for count paths), and a
    # combining mark + embedded zero-width joiner. Exercises every
    # char-indexed path (BPE substr char split, char-class profiles,
    # levenshtein, normalization regexes) for codepoint-vs-code-unit
    # divergence between Spark and DuckDB.
    if len(docs["doc_id"]) >= 16:
        zwj = "\u200d"
        docs["text"][12] = ("\U0001F600 data \U0001F469" + zwj +
                            "\U0001F469" + zwj + "\U0001F467 pipeline "
                            "\U0001F680\U0001F680 scan")
        docs["text"][13] = ("\u6570\u636e \u7ba1\u9053 \u8d28\u91cf "
                            "\u6570\u636e \u68c0\u67e5")
        docs["text"][14] = ("cafe\u0301 cafe\u0301 te" + zwj + "st join")
        # whitespace hazards: consecutive/leading/trailing spaces make
        # EMPTY WORDS under single-space split in both engines —
        # zero-symbol BPE words, empty shingles, rollhash zero flushes
        docs["text"][15] = " lead  double trail "
        for i in (12, 13, 14, 15):
            docs["n_chars"][i] = len(docs["text"][i])
    # round-12 hazards: TIED BPE pair weights + symbol conflicts — the
    # batched trainer (bpeTrainStateBatched) must stay bit-identical to
    # sequential under equal-weight candidates sharing symbols (its
    # stop-at-first-conflict + strict-boundary rule), and the gate
    # replays the SEQUENTIAL chain, so any divergence fails q229/q231/
    # q238/q241/q249 here. "abab"×k ties (a,b)/(b,a); "ccd"×k plants a
    # same-weight disjoint pair; "aab" keeps a conflicted (a,a) live.
    if len(docs["doc_id"]) >= 20:
        docs["text"][16] = "abab abab abab ccd ccd ccd aab"
        docs["text"][17] = "abab ccd abab ccd baba dcc"
        docs["text"][18] = "aa bb aa bb cc dd cc dd"
        for i in (16, 17, 18):
            docs["n_chars"][i] = len(docs["text"][i])
    # round-12 hazard 2: BOILERPLATE WHALE — one identical 8-word
    # license header appended to 300 docs, so the q245 substring-dedup
    # gram has df = 300 (> cap/2 = 256): the whale chunk-tile path and
    # every df-capped hot-branch (q102/q137 heavy residuals, capped
    # shingle arrays) run on REAL data inside the gate, not only in
    # planted specs. ~45k true span pairs; both engines recompute.
    if len(docs["doc_id"]) >= 320:
        boiler = ("common license header shared across many docs "
                  "verbatim")
        for i in range(20, 320):
            docs["text"][i] = docs["text"][i] + " " + boiler
            docs["n_chars"][i] = len(docs["text"][i])
    # round-13 hazard: PERCEPTUAL-HASH COLLISION BY ANAGRAM — two docs
    # whose texts differ (different byte digests: qm5 must NOT pair
    # them) but whose code-point CHUNK SUMS are identical (a word's
    # letters scrambled in place preserves every chunk sum), so the
    # qm6 fallback dHash collides and qm7's banding+verify MUST emit
    # the pair at Hamming 0. Exercises the banding stage on a true
    # non-byte-identical collision inside the gate. The texts also
    # keep equal lengths (n_chars paths unchanged).
    if len(docs["doc_id"]) >= 340:
        base = " ".join((
            "the integral scanner walks every parquet row group twice "
            "before the planner commits to a layout and the shuffle "
            "service keeps one spill file per reducer while the driver "
            "tracks block liveness across executor generations so that "
            "a lost node replays only its own map outputs instead of "
            "the whole stage and the scheduler keeps locality hints "
            "alive until the last fetch completes cleanly").split() * 2)
        # swap of two adjacent letters INSIDE one 63-chunk (text is
        # ~767 cps, chunks ~12 wide) keeps every chunk sum equal
        docs["text"][330] = base
        docs["text"][331] = base[1] + base[0] + base[2:]
        assert docs["text"][330] != docs["text"][331]
        for i in (330, 331):
            docs["n_chars"][i] = len(docs["text"][i])
    # round-15 hazards: UNIGRAM LENGTH-CAP BOUNDARY — q304's scope is
    # words of 1..16 CODE POINTS, and the DP unrolls exactly 16
    # rounds, so plant (a) an astral-led 16-code-point word (emoji +
    # 15 ASCII: included ONLY under code-point length — a UTF-16
    # code-unit counter would see 17 and silently exclude it), (b) a
    # plain 16-cp word (a potential 16-single-piece path needs every
    # DP round), (c) a 17-cp word (excluded, the cap's other side).
    # Plus tied multi-piece frequencies ("zq"/"wj") exercising the
    # (freq desc, piece asc) vocab rank ties on real data.
    if len(docs["doc_id"]) >= 340:
        docs["text"][332] = ("\U0001F600abcdefghijklmno "
                             "zzqqwwxxyyvvkkjj seventeencharword")
        docs["text"][333] = "zq zq wj wj zq wj"
        for i in (332, 333):
            docs["n_chars"][i] = len(docs["text"][i])
    tabs["documents"] = pa.Table.from_pydict(
        docs, schema=tabs["documents"].schema)

    # orders: bucket-boundary prices (after the hot replication, so
    # position 0/1 are original rows)
    od = tabs["orders"].to_pydict()
    if len(od["o_orderkey"]) >= 2:
        od["o_totalprice"][0] = 270000.0
        od["o_totalprice"][1] = 30000.0
    tabs["orders"] = pa.Table.from_pydict(od, schema=tabs["orders"].schema)

    # embeddings: duplicate vec 0 under a new id with another label
    emb = tabs["embeddings"]
    v0 = emb.slice(0, 1).to_pydict()
    v0["vec_id"] = [pa.compute.max(emb["vec_id"]).as_py() + 1]
    v0["label"] = [(v0["label"][0] + 1) % 5]
    tabs["embeddings"] = pa.concat_tables(
        [emb, pa.Table.from_pydict(v0, schema=emb.schema)])

    for t in TABLES:
        out_t = shuffle(tabs[t], rng)
        pq.write_table(out_t, os.path.join(out, f"{t}.parquet"))
        print(f"{t}: {tabs[t].num_rows} rows -> {out_t.num_rows}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
