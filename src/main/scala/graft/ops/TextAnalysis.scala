package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * shingling, quality metrics, language-ID, fingerprinting. All built on
  * codegen'd builtins/higher-order functions — no UDFs, so every operator
  * is partition-parallel and pushdown-friendly at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokenization on single spaces (the corpus' delimiter;
    * engine-portable, unlike locale-aware analyzers). */
  def tokens(text: Column): Column = split(text, " ")

  /** n-token shingles joined by spaces; empty when the doc is shorter
    * than n (guarded: Spark's sequence(1,0) counts DOWN, it is not empty). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array())

  /** The distinct shingle set used for jaccard comparisons.
    *
    * IMPORTANT: `toks` must be a materialized column (e.g. via
    * `.withColumn("toks", tokens(col))`), NOT an inline `split(...)`
    * expression — lambda bodies re-evaluate their captured expressions per
    * element, so an inlined split makes shingling quadratic in tokens
    * (profiled: one 5000-doc partition took >10 min; materialized, <2 s). */
  def shingleSet(toks: Column, n: Int): Column =
    array_distinct(shingles(toks, n))

  /** BPE-style pre-tokenization regex: lowercase runs, capitalized word
    * fragments, digit runs, and single punctuation marks — the classic
    * GPT-2-style splitting pass that precedes byte-pair merging. Kept to
    * ASCII character classes so Java regex (Spark) and RE2 (DuckDB
    * oracle) agree on every boundary. */
  val SubwordPattern = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9 ]"

  /** Subword-ish tokens of a text column per `SubwordPattern` — the
    * token-counting primitive of a training-data pipeline (whitespace
    * tokens overcount bytes-per-token for BPE-trained models). */
  def subwordTokens(text: Column): Column =
    regexp_extract_all(text, lit(SubwordPattern), lit(0))

  /** Jaccard similarity of two pre-distinct arrays, computed from set
    * sizes only (|A∩B| / (|A|+|B|-|A∩B|)) — integer arithmetic until one
    * exact double division, so any engine agrees exactly. */
  def jaccard(setA: Column, setB: Column): Column = {
    val inter = size(array_intersect(setA, setB)).cast("double")
    inter / (size(setA) + size(setB) - size(array_intersect(setA, setB)))
  }

  /** Small conventional stopword marker set (quality scoring). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Per-document quality metrics: char/token counts, distinct-token
    * ratio, stopword ratio. Ratios are int/int → exact doubles. */
  def qualityMetrics(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    val stopArr = array(Stopwords.map(lit): _*)
    df
      .withColumn("n_chars", length(text).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(toks)).cast("long"))
      .withColumn("distinct_ratio",
        col("n_distinct_tokens").cast("double") / col("n_tokens"))
      .withColumn("stopword_ratio",
        size(filter(toks, t => array_contains(stopArr, t))).cast("double")
          / col("n_tokens"))
  }

  /** Marker-token language scorer: per language, how many tokens hit its
    * marker list. Argmax with deterministic lexicographic tiebreak via
    * struct ordering (score first, then language code). */
  def langId(df: DataFrame, text: Column,
             markers: Map[String, Seq[String]]): DataFrame = {
    val toks = tokens(text)
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val arr = array(words.map(lit): _*)
      struct(
        size(filter(toks, t => array_contains(arr, t))).as("score"),
        lit(lang).as("lang"))
    }
    df.withColumn("lang_scores", array(scored: _*))
      .withColumn("predicted_lang", array_max(col("lang_scores")).getField("lang"))
      .withColumn("lang_score", array_max(col("lang_scores")).getField("score").cast("long"))
      .drop("lang_scores")
  }

  /** Per-document top-k TF-IDF-weighted terms. IDF is the raw rarity
    * ratio N/df rather than log(N/df): a logarithm is monotone (same
    * ranking) but not bit-specified across engines, while one IEEE
    * division and multiplication are exact — so the scores, not just the
    * ranks, reproduce anywhere. Plan shape: two hash aggregations
    * ((doc,term) tf, then term df), a shuffle join tf⋈df on term, and a
    * broadcast of the 1-row corpus count; the per-doc top-k is a
    * row_number window that computes partial top-k map-side. All counts
    * flow as longs; ties break on the term itself for determinism. */
  def tfidfTopTerms(docs: DataFrame, idCol: Column, text: Column,
                    k: Int): DataFrame = {
    val tok = docs.select(idCol.as("doc_id"), explode(tokens(text)).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
    val nDocs = docs.agg(countDistinct(idCol).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * (col("n_docs").cast("double") / col("dfreq")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"),
        col("dfreq"), col("score"))
  }

  /** Engine-portable 32-bit SimHash: token hash = first 8 md5 hex digits
    * as uint32; signature bit j set iff more tokens have bit j set than
    * clear (duplicates counted, ties → 0, classic simhash). All
    * arithmetic is md5 + exact double shifts (h / 2^j is exponent-only,
    * bit-exact in IEEE), so any engine computes the identical signature —
    * unlike the xxhash64 fast path (Dedup.simhashSignatures), which is
    * Spark-specific. Adds `hs32` (token hashes) and `simhash32`. */
  def withSimhash32Portable(df: DataFrame, toksCol: Column): DataFrame =
    df
      .withColumn("hs32", transform(filter(toksCol, t => t =!= ""),
        t => conv(substring(md5(t), 1, 8), 16, 10).cast("long")))
      .withColumn("simhash32",
        aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, j) => {
          val pow2j = pow(lit(2.0), j.cast("double"))
          val ones = size(filter(col("hs32"),
            h => pmod(floor(h / pow2j), lit(2)) === 1))
          acc + when(ones * 2 > size(col("hs32")), pow2j.cast("long"))
            .otherwise(lit(0L))
        }))

  /** PII-style masking patterns — ASCII-only so Java regex (Spark) and
    * RE2 (DuckDB oracle) agree on every boundary. The email pattern is
    * deliberately permissive (training-data scrubbing favors recall
    * over precision: over-masking costs a token, under-masking leaks). */
  val EmailPattern = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
  val PhonePattern = "[0-9]{3}-[0-9]+"

  /** Redact email- and phone-shaped spans with typed mask tokens — the
    * PII-scrubbing pass of a training-data pipeline. Built on codegen'd
    * regexp_replace (global by default in Spark): partition-parallel,
    * no UDF. Email masking runs first so digit runs inside addresses
    * can't be half-eaten by the phone pattern. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Count of pattern matches in a text column (`regexp_extract_all` +
    * size; DuckDB twin: `len(regexp_extract_all(...))`). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Standard first cleaning pass of a pretraining text pipeline:
    * Unicode NFC normalization (custom codegen'd expression — no Spark
    * builtin, and a UDF would break whole-stage codegen on the 100 TB
    * scan), then strip ASCII control characters (keeping \t \n \r), then
    * collapse space runs and trim. Every step has a bit-exact DuckDB
    * twin (`nfc_normalize` + the same ASCII regexes), so the whole pass
    * is oracle-checkable. */
  def normalizeClean(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        org.apache.spark.sql.GraftBridge.column(
          graft.functions.NfcNormalize(
            org.apache.spark.sql.GraftBridge.expression(text))),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      " +", " "))

  /** Per-group duplicate-n-gram statistics: total and distinct n-gram
    * counts summed as longs, with ONE final division — so the ratio is
    * bit-exact across engines and partitionings (summing per-doc double
    * ratios would be order-dependent). High dup_ratio = boilerplate/
    * template text, the classic n-gram repetition quality signal. */
  def repetitionStats(docs: DataFrame, groupKey: Column, text: Column,
                      n: Int): DataFrame =
    docs
      .withColumn("__toks", tokens(text))
      .filter(size(col("__toks")) >= n)
      .withColumn("__grams", shingles(col("__toks"), n))
      .groupBy(groupKey)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("__grams"))).cast("long").as("total_grams"),
        sum(size(array_distinct(col("__grams")))).cast("long").as("distinct_grams"))
      .withColumn("dup_ratio",
        lit(1.0) - col("distinct_grams").cast("double") / col("total_grams"))

  /** Train/test contamination sweep — the decontamination pass every
    * eval pipeline needs: for each test document, how many of its
    * distinct n-grams also appear anywhere in the train split. One
    * distinct-gram explode per side and ONE equi-join on the gram — a
    * single linear shuffle keyed by gram, the shape that survives a
    * 100 TB train corpus (no pairwise doc×doc comparison ever
    * materializes; skewed boilerplate grams ride AQE). Returns one row
    * per test doc: (id, n_grams, n_hit). */
  def contamination(docs: DataFrame, idCol: Column, text: Column,
                    isTest: Column, n: Int): DataFrame = {
    val grams = docs
      .withColumn("__toks", tokens(text))
      .filter(size(col("__toks")) >= n)
      .select(idCol.as("doc_id"), isTest.as("is_test"),
        explode(array_distinct(shingles(col("__toks"), n))).as("gram"))
    val trainGrams = grams.filter(!col("is_test"))
      .select(col("gram")).distinct()
    val testGrams = grams.filter(col("is_test"))
    val hits = testGrams.join(trainGrams, Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    testGrams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
  }

  /** DECONTAMINATE the train split: drop every train document that
    * shares at least one distinct n-gram with ANY test document — the
    * enforcement half of [[contamination]] (which only reports). The
    * train/eval boundary is worthless if eval text leaks into
    * training; this removes the leak train-side, keeping the eval set
    * intact. Shape at 100 TB: one distinct-gram explode per side, one
    * gram-keyed semi join to name the offending train docs, one anti
    * join back — all linear shuffles keyed by gram/id, never doc×doc.
    * Train docs shorter than n tokens carry no gram and survive by
    * construction. Returns the surviving train rows, columns intact. */
  def decontaminate(train: DataFrame, test: DataFrame, idCol: Column,
                    text: Column, n: Int): DataFrame = {
    def grams(df: DataFrame) = df
      .withColumn("__toks", tokens(text))
      .filter(size(col("__toks")) >= n)
      .select(idCol.as("__doc_id"),
        explode(array_distinct(shingles(col("__toks"), n))).as("__gram"))
    val testGrams = grams(test).select(col("__gram")).distinct()
    val dirty = grams(train).join(testGrams, Seq("__gram"), "left_semi")
      .select(col("__doc_id")).distinct()
    train.join(dirty, idCol === col("__doc_id"), "left_anti")
  }

  /** Polynomial rolling fingerprint over token hashes, mod 2^31−1 at
    * every step so the fold can never overflow a long under ANSI mode:
    * fp = ((fp·31 mod p) + (xxhash64(token) mod p)) mod p. Pure
    * arithmetic over a deterministic hash → stable across runs/partitions. */
  def fingerprint(toks: Column): Column = {
    val p = lit(2147483647L)
    aggregate(toks, lit(0L),
      (acc, t) => pmod(pmod(acc * 31, p) + pmod(xxhash64(t), p), p))
  }

  /** n-gram language-model quality scoring — the CCNet-style "does this
    * document look like the reference corpus" filter, in engine-portable
    * integer arithmetic (log-perplexity's floating sums diverge across
    * engines in the last ulp; a 1e6-scaled integral frequency ratio and
    * an OOV count rank documents the same way and compare bit-exactly).
    *
    * Model = bigram occurrence counts over the `isRef` slice of the
    * corpus. Each document scores as:
    *   n_bigrams  — its bigram instances;
    *   oov        — instances whose bigram the reference never saw;
    *   freq_score — Σ (refCount(gram)·10^6 div refTotal) over instances
    *                (0 for unseen), i.e. scaled expected-frequency mass.
    * Low freq_score / high oov = unlike the reference → filter fodder.
    *
    * Shape at 100 TB: one groupBy(gram) over the reference slice, ONE
    * gram-keyed equi-join of document instances against the model (no
    * doc×doc, no collect — the 1-row total broadcasts), one groupBy(doc).
    * Docs with <2 tokens surface with zeros via the final left join.
    * The 10^6 scale keeps every product below 2^63 up to ~10^12 model
    * grams; shrink it past that. */
  def ngramLmScore(docs: DataFrame, idCol: Column, text: Column,
                   isRef: Column): DataFrame = {
    val grams = docs
      .withColumn("__toks", tokens(text))
      .select(idCol.as("doc_id"), isRef.as("is_ref"),
        explode(shingles(col("__toks"), 2)).as("gram"))
    val model = grams.filter(col("is_ref"))
      .groupBy(col("gram")).agg(count(lit(1)).as("ref_cnt"))
    val total = model.agg(sum(col("ref_cnt")).as("ref_total"))
    val scored = grams
      .join(model, Seq("gram"), "left")
      .crossJoin(broadcast(total)) // 1 row
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("ref_cnt").isNull, 1L).otherwise(0L)).as("oov"),
        sum(coalesce(expr("(ref_cnt * 1000000L) div ref_total"), lit(0L)))
          .as("freq_score"))
    docs.select(idCol.as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("oov"), lit(0L)).as("oov"),
        coalesce(col("freq_score"), lit(0L)).as("freq_score"))
  }

  /** BM25 relevance of every document against a bag of query terms
    * (Robertson/Sparck Jones idf in the non-negative ln(1+x) form, the
    * same shape Lucene uses): for each query term t with document
    * frequency df over N docs,
    *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).
    * Returns (doc_id, n_terms_matched, score) for docs matching ≥1 term.
    *
    * Shape at scale: ONE explode→filter (the `isin` prunes to query
    * terms before the shuffle, so the grouped frame is |Q|·docs rows at
    * worst, not corpus token count), one |Q|-row broadcast of the df
    * table, one broadcast 1-row corpus-stats frame. No doc×doc, no
    * driver collect — the classic "distributed grep + rank" plan. */
  def bm25(docs: DataFrame, idCol: Column, text: Column,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    val base = docs.select(idCol.as("doc_id"), tokens(text).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats)) // 1 row
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_matched"),
        round(sum(col("contrib")), 6).as("score"))
  }

  /** Fuzzy self-join by edit distance with q-gram PREFIX blocking
    * (after the public ED-Join filtering of Xiao et al. 2008, VLDB):
    * two strings within edit distance k share all but at most q·k of
    * their q-grams, so under one GLOBAL gram order (rarest first) any
    * true pair must collide on at least one of each string's q·k+1
    * rarest grams. Candidates therefore come from an equi-join on those
    * prefix grams only — the hot grams every string shares (think a
    * common name stem) never block, which is what keeps this linear
    * instead of all-pairs. Strings too short for the count bound
    * (length < 2k+2) are exhaustively paired against everything via a
    * broadcast (they must be RARE — at web scale near-empty strings
    * belong in a quality filter long before entity resolution). The
    * exact `levenshtein` (codegen'd builtin) then verifies candidates.
    *
    * Returns (id_a, id_b, s_a, s_b, dist) with id_a < id_b, each true
    * pair exactly once. One gram explode + frequency count + prefix
    * rank, one gram-keyed candidate join, one verify — no cartesian. */
  def fuzzySelfJoin(df: DataFrame, idCol: Column, strCol: Column,
                    maxDist: Int = 1, q: Int = 2): DataFrame = {
    require(maxDist >= 0 && q >= 2, s"maxDist=$maxDist q=$q")
    val base = df.select(idCol.as("id"), strCol.as("s"))
    val minLen = 2 * maxDist + 2
    // q-grams of s: positions 1 .. len-q+1
    val grams = base
      .filter(length(col("s")) >= minLen)
      .select(col("id"), explode(array_distinct(
        transform(sequence(lit(1), length(col("s")) - lit(q - 1)),
          i => col("s").substr(i, lit(q))))).as("gram"))
    val freq = grams.groupBy(col("gram")).agg(count(lit(1)).as("__gf"))
    val prefixLen = q * maxDist + 1
    val wRare = Window.partitionBy(col("id"))
      .orderBy(col("__gf").asc, col("gram").asc)
    val prefix = grams.join(freq, Seq("gram"))
      .withColumn("__rn", row_number().over(wRare))
      .filter(col("__rn") <= prefixLen)
      .select(col("id"), col("gram"))
    val candidates = prefix.as("pa")
      .join(prefix.as("pb"), col("pa.gram") === col("pb.gram") &&
        col("pa.id") < col("pb.id"))
      .select(col("pa.id").as("id_a"), col("pb.id").as("id_b"))
      .distinct()
    // short strings: exhaustive against every OTHER string (broadcast —
    // the short side is tiny by contract)
    val short = base.filter(length(col("s")) < minLen)
    val shortPairs = broadcast(short.as("sa"))
      .join(base.as("sb"), col("sa.id") =!= col("sb.id"))
      .select(least(col("sa.id"), col("sb.id")).as("id_a"),
        greatest(col("sa.id"), col("sb.id")).as("id_b"))
      .distinct()
    val allCand = candidates.unionByName(shortPairs).distinct()
    allCand
      .join(base.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"), col("dist"))
  }

  /** Corpus-frequency vocabulary pruning: drop every token whose GLOBAL
    * corpus frequency falls below `keepPerMille` per-mille of all
    * corpus tokens (OCR noise, mojibake, one-off typos — the long tail
    * a tokenizer's vocab build discards), rebuilding each document from
    * its surviving tokens in order. The threshold is RELATIVE, so the
    * rule is invariant under corpus scale, and the comparison is pure
    * integer arithmetic (`freq * 1000 >= total * keepPerMille`) so any
    * engine computes the identical keep set — no float rounding at the
    * boundary. Documents whose every token is rare vanish from the
    * output (their cleaned text would be empty).
    *
    * Scale shape: one explode (linear, no state), one map-side-partial
    * count per token, one token-keyed shuffle join of occurrences
    * against frequencies (the frequency side is one row per DISTINCT
    * token — at web scale the tail is billions of rows, far too big to
    * broadcast, which is why this is a join and not a broadcast
    * filter; AQE handles the hot-token skew), one corpus-total scalar
    * broadcast, and one doc-keyed reassembly. No doc×doc, no
    * driver-side state. */
  def pruneRareTokens(docs: DataFrame, idCol: Column, textCol: Column,
                      keepPerMille: Long = 1L): DataFrame = {
    val toks = docs.select(idCol.as("doc_id"),
      posexplode(split(textCol, " ")).as(Seq("pos", "tok")))
    val total = toks.agg(count(lit(1)).as("__total"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("__freq"))
    toks.join(freq, Seq("tok"))
      .crossJoin(broadcast(total)) // 1 row
      .filter(col("__freq") * lit(1000L) >= col("__total") * lit(keepPerMille))
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("text_pruned"),
        count(lit(1)).as("n_tokens_kept"))
  }

  /** Sliding-window chunking (the context-window preprocessor every
    * LLM training/RAG pipeline runs): split into whitespace tokens,
    * emit windows of `windowTokens` advancing by `strideTokens`
    * (overlap = window − stride keeps boundary context in two chunks).
    * Window starts are 0, stride, 2·stride, … up to the FIRST start
    * whose window reaches the document's end — so every token lands in
    * ≥1 chunk, the tail is never emitted twice, and a short document
    * yields exactly one (possibly short) chunk. Whitespace-only
    * documents emit nothing. Output: (doc_id, chunk_index, n_tokens,
    * chunk_text).
    *
    * Scale shape: a pure per-row map + explode — no shuffle, no state;
    * the ~len/stride row blow-up is the chunking itself. Integer-only
    * window math, so any engine derives the identical chunk set. */
  def chunkWindows(docs: DataFrame, idCol: Column, textCol: Column,
                   windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive")
    require(strideTokens > 0 && strideTokens <= windowTokens,
      s"strideTokens must be in [1, windowTokens]")
    val w = lit(windowTokens); val st = lit(strideTokens)
    // tokens = maximal non-whitespace runs: the empty pieces a leading/
    // trailing-whitespace split leaves differ BETWEEN engines (Java
    // drops trailing empties, other regex splitters keep them) — filter
    // them so the chunk set is engine-portable by construction
    val toks = filter(split(textCol, "\\s+"), t => length(t) > 0)
    val withToks = docs
      .select(idCol.as("doc_id"), toks.as("__toks"), size(toks).as("__n"))
      .filter(col("__n") > 0)
    // last start = the smallest multiple of stride with start+w >= n,
    // i.e. ceil((n-w)/stride)*stride — computed with integer mod only
    // (float division could round the boundary at large n)
    val ceilBase = (col("__n") - w + st - 1).cast("long")
    val lastStart = when(col("__n") <= w, lit(0L))
      .otherwise(ceilBase - pmod(ceilBase, st.cast("long")))
    withToks
      .select(col("doc_id"), col("__toks"), col("__n"),
        explode(sequence(lit(0L), lastStart, st.cast("long"))).as("__start"))
      .select(
        col("doc_id"),
        (col("__start") / st).cast("long").as("chunk_index"),
        least(w.cast("long"), col("__n") - col("__start")).as("n_tokens"),
        concat_ws(" ",
          slice(col("__toks"), (col("__start") + 1).cast("int"),
            lit(windowTokens)))
          .as("chunk_text"))
  }
}
