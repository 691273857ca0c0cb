package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines over the
  * `documents` table: tokenization, quality scoring, n-gram language ID and
  * document fingerprinting.
  *
  * Everything here is a pure `Column` expression (whole-stage codegen, no
  * UDFs): at 100 TB these run map-side inside the Parquet scan stage with
  * zero shuffles — the scan's own partitioning is the parallelism.
  */
object TextOps {

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: the operator shape (token ∈ profile
    * scoring + deterministic argmax) is what matters; real deployments swap
    * in fuller profiles without touching the plan.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "en" -> Seq("the", "a", "an", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "y", "que", "es", "un", "en"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "en"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就"))

  /** Lower-cased whitespace tokens, empties dropped. */
  def wsTokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** BPE-ish pre-tokenization: letter runs | digit runs | single symbol. */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(bpePattern), lit(0))

  /** Count of tokens that appear in `words` (multiset count, not distinct). */
  def tokenHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Ratio of characters matching `charClass` (Java/RE2-portable class). */
  def charRatio(text: Column, charClass: String): Column =
    when(length(text) > 0,
      length(regexp_replace(lower(text), s"[^$charClass]", "")).cast("double") /
        length(text)).otherwise(0.0)

  /** Quality metrics in the style of Gopher/C4 document filters: length,
    * alpha/digit/punct composition, mean word length, stopword density and
    * a combined [0,1] score.
    */
  def qualityColumns(text: Column): Seq[Column] = {
    val toks = wsTokens(text)
    val nTok = size(toks)
    val alphaRatio = charRatio(text, "a-z")
    val punctRatio = charRatio(text, ".,!?;:")
    val stopRatio = when(nTok > 0,
      tokenHits(toks, stopwords("en")).cast("double") / nTok).otherwise(0.0)
    val meanWordLen = when(nTok > 0,
      length(regexp_replace(text, "\\s+", "")).cast("double") / nTok).otherwise(0.0)
    val score =
      least(nTok.cast("double") / 50.0, lit(1.0)) * 0.4 +
        alphaRatio * 0.3 +
        least(stopRatio * 4.0, lit(1.0)) * 0.2 +
        (lit(1.0) - punctRatio) * 0.1
    Seq(
      nTok.cast("long").as("n_ws_tokens"),
      size(bpeTokens(text)).cast("long").as("n_bpe_tokens"),
      alphaRatio.as("alpha_ratio"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
      meanWordLen.as("mean_word_len"),
      score.as("quality_score"))
  }

  /** Language-ID: per-language stopword-hit scores + argmax prediction with
    * deterministic alphabetical tie-break (a fixed CASE chain, identical on
    * any SQL engine).
    */
  def langIdColumns(text: Column): Seq[Column] = {
    val toks = wsTokens(text)
    val langs = stopwords.keys.toSeq.sorted
    val score = langs.map(l => l -> tokenHits(toks, stopwords(l))).toMap
    def maxOf(cs: Seq[Column]) = if (cs.size == 1) cs.head else greatest(cs: _*)
    val pred = langs.init.foldRight(lit(langs.last): Column) { (l, rest) =>
      val later = langs.drop(langs.indexOf(l) + 1).map(score)
      when(score(l) >= maxOf(later), lit(l)).otherwise(rest)
    }
    langs.map(l => score(l).cast("long").as(s"score_$l")) :+ pred.as("pred_lang")
  }

  /** Word n-gram shingles (distinct), degenerating to one whole-text shingle
    * for docs shorter than n tokens.
    *
    * Built by zipping n shifted slices of the token array, NOT by slicing
    * inside a positional lambda: a lambda that captures a COMPUTED `toks`
    * re-evaluates it once per shingle position, turning shingling quadratic
    * in document length. Here `toks` evaluates n+2 times per row, the
    * lambda touches only its own zipped element, and the shorter shifted
    * tails zip as NULLs that concat_ws skips (reproducing the truncated
    * final shingles).
    */
  def shingles(toks: Column, n: Int): Column = {
    // empty docs: the positional form yields one empty shingle, the zip
    // form none — keep the historical [""] so fingerprints are stable
    when(size(toks) === 0, array(lit(""))).otherwise(
      array_distinct(shinglesAll(toks, n)))
  }

  /** Positional word n-grams WITH duplicates — repetition metrics need
    * occurrence counts, so no dedup and no empty-doc placeholder (empty
    * toks ⇒ empty array). Same zip construction and sub-n-token truncation
    * as [[shingles]], which is this column's distinct projection.
    */
  def shinglesAll(toks: Column, n: Int): Column = {
    val s = greatest(size(toks) - n, lit(0)) + 1 // shingle positions
    val shifted = (0 until n).map(j => slice(toks, lit(j + 1), s))
    transform(arrays_zip(shifted: _*),
      e => concat_ws(" ", (0 until n).map(j => e.getField(j.toString)): _*))
  }

  /** Character n-grams over an ALREADY-normalized text column.
    *
    * `norm` must be a plain attribute (pre-projected), not a computed
    * expression: it is referenced inside the positional lambda, and a
    * computed column there re-evaluates once per character — the same
    * quadratic trap [[shingles]] documents for token arrays. Callers
    * project `regexp_replace(lower(text), "\\s+", " ")` first and pass
    * the resulting column.
    */
  def charNgrams(norm: Column, n: Int): Column =
    when(length(norm) >= n,
      transform(sequence(lit(1), length(norm) - (n - 1)),
        i => norm.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Per-document repetition statistics over an n-gram multiset — the two
    * signals behind Gopher-style repetition filters (Rae et al. 2021, §A1.1):
    *
    *  - `top`: characters covered by the single most-covering n-gram,
    *    `max over distinct grams of count(g)·len(g)` (deterministic without a
    *    tie-break: ties on the PRODUCT give the same coverage);
    *  - `dup`: characters covered by all DUPLICATED n-grams,
    *    `Σ over grams with count≥2 of count(g)·len(g)`.
    *
    * One pass over the row's sorted gram array (equal grams adjacent) with an
    * O(1) struct state — no explode, no shuffle: at 100 TB this stays inside
    * the scan stage like every other TextOps column. Callers divide by the
    * document's character count and compare against the published thresholds.
    *
    * `grams` is evaluated exactly once (it is the aggregate's input, not a
    * lambda capture), so passing computed [[shinglesAll]] columns is safe.
    */
  def repetitionStats(grams: Column): Column = {
    val sorted = array_sort(grams)
    aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("top"), lit(0L).as("dup")),
      (st, x) => {
        val run = when(x === st.getField("prev"),
          st.getField("run") + 1L).otherwise(1L)
        val cov = run * length(x).cast("long")
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("top"), cov).as("top"),
          (st.getField("dup") +
            when(run === 2L, lit(2L) * length(x).cast("long"))
              .otherwise(when(run > 2L, length(x).cast("long"))
                .otherwise(0L))).as("dup"))
      },
      st => struct(st.getField("top").as("top"), st.getField("dup").as("dup")))
  }

  /** Bottom-k sketch fingerprint: the k lexicographically-smallest md5s of
    * the shingle set, plus their digest — a compact rolling-hash-style
    * document signature whose equality ⇒ near-duplicate content.
    */
  def fingerprintColumns(text: Column, n: Int, k: Int): Seq[Column] = {
    val sk = slice(array_sort(transform(shingles(wsTokens(text), n), md5 _)), 1, k)
    Seq(md5(concat_ws("|", sk)).as("fingerprint"),
      element_at(sk, 1).as("min_shingle_hash"))
  }

  /** PII patterns, deliberately restricted to syntax with identical
    * semantics in Java regex (Spark codegen) and RE2 (DuckDB oracle):
    * plain character classes and bounded repetition only — no lookaround,
    * no \b, no backreferences.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
  val ipv4Re = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  /** PII detection + redaction over a text column: per-pattern match
    * counts, an any-PII flag, and the md5 of the text with every match
    * replaced by its placeholder (emails first — an IPv4-shaped fragment
    * can only survive inside a wider email match, never the reverse).
    * Pure codegen'd expressions: the whole scrub runs inside the scan
    * stage, no UDF, no shuffle.
    */
  /** Gopher-style repetition keep flag (Rae et al. 2021 §A1.1), the same
    * unrounded char-fraction thresholds the `text_repetition` gate pins:
    * top-n-gram coverage (n=2,3,4) and duplicated-n-gram coverage
    * (n=5,10), occurrence-weighted, over the text's char length. Every
    * term is a per-row expression over the token array — the whole filter
    * runs inside the scan stage, no shuffle.
    */
  def keepRepetition(text: Column, toks: Column): Column = {
    val nc = length(text).cast("double")
    def frac(n: Int, f: String) =
      repetitionStats(shinglesAll(toks, n)).getField(f).cast("double") / nc
    frac(2, "top") <= 0.20 && frac(3, "top") <= 0.18 &&
      frac(4, "top") <= 0.16 && frac(5, "dup") <= 0.15 &&
      frac(10, "dup") <= 0.10
  }

  /** The scrubbed text itself (emails → phones → IPs, same order as
    * [[piiColumns]] — an IPv4-shaped fragment can only survive inside a
    * wider email match, never the reverse). Exposed for pipelines whose
    * downstream stages (dedup, shingling, storage) must run over the
    * REDACTED text, not just hash it.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  def piiColumns(text: Column): Seq[Column] = {
    val redacted = redact(text)
    Seq(
      regexp_count(text, lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(text, lit(phoneRe)).cast("long").as("n_phones"),
      regexp_count(text, lit(ipv4Re)).cast("long").as("n_ips"),
      (regexp_count(text, lit(emailRe)) + regexp_count(text, lit(phoneRe)) +
        regexp_count(text, lit(ipv4Re)) > 0).as("has_pii"),
      md5(redacted).as("redacted_md5"))
  }
}
