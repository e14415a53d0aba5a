package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data-pipeline preprocessing over a
  * string column: tokenization, shingling, quality scoring, n-gram
  * language ID, and document fingerprinting. Everything is built from
  * codegen'd Catalyst expressions (no UDFs): at 100 TB these run inside
  * whole-stage codegen over the parquet scan with full column pruning.
  *
  * Determinism contract: all hashing is md5-hex (stable across engines),
  * ratios are single double divisions of exact integer counts, so results
  * hash-match a DuckDB oracle bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace tokens, empty strings dropped.
    *
    * PERF: callers must materialize this as its own column (withColumn)
    * before passing it to [[shingles]]/[[hitCount]] — inlined, every
    * element_at in the shingle lambda would re-run the split, turning a
    * linear pass into O(shingles × k) splits per row (measured 10×+ on
    * the sf0.1 bench). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Word k-shingles joined with single spaces; docs shorter than k
    * tokens yield an empty set. `toks` should be a materialized column. */
  def shingles(toks: Column, k: Int = 3): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k), i =>
        concat_ws(" ", (1 to k).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** BPE-style pre-tokenization pattern: alphabetic runs, digit runs, and
    * single non-space punctuation — the piece segmentation BPE vocabularies
    * merge from, usable for LLM token budgeting without a vocab file.
    * Plain character classes only, so Java and RE2-family engines agree. */
  val bpePattern: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** All BPE-style pieces of `text`, in order (one regex pass). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  /** Learn a deterministic toy BPE merges table from the corpus itself,
    * in two rounds — the table-driven counterpart of [[bpeTokens]]'s
    * regex placeholder. Round 1 counts adjacent CODE-POINT pairs over
    * every occurrence of the learning vocabulary (lowercase-alnum words
    * — ASCII-only so count ties break identically in any engine's
    * collation) and keeps the top `k1` by (count desc, pair asc).
    * Round 2 applies those merges ([[graft.functions.BpeEncode]]) to
    * the distinct learning words, counts adjacent SYMBOL pairs weighted
    * by word frequency, and appends the top `k2` at ranks k1…k1+k2−1 —
    * so learned symbols compound (multi-char merges of multi-char
    * symbols), exercising real rank-cascade behavior.
    *
    * This is a deliberately replayable stand-in for offline BPE
    * training (which is vocab-size sequential passes, run once, not a
    * per-query operator): two aggregations and two bounded `collect`s
    * of ≤ k1/k2 rows — the merges TABLE is the artifact, and the DuckDB
    * oracle re-derives it from the same parquet with the same
    * statistics, which is what lets q_x24 hash-check the entire
    * tokenizer (table + application) end-to-end. */
  def learnBpeMerges(df: DataFrame, textCol: String,
      k1: Int = 24, k2: Int = 24): Seq[(String, String)] = {
    require(k1 >= 1 && k2 >= 0, s"need k1 >= 1, k2 >= 0, got $k1/$k2")
    val wc = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    def topPairs(pairs: DataFrame, k: Int): Seq[(String, String)] =
      pairs.groupBy(col("a"), col("b")).agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(k)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val m1 = topPairs(
      wc.filter(length(col("w")) >= 2)
        .select(col("wc"), explode(transform(
          sequence(lit(1), length(col("w")) - 1),
          i => struct(col("w").substr(i, lit(1)).as("a"),
            col("w").substr(i + 1, lit(1)).as("b")))).as("p"))
        .select(col("wc"), col("p.a"), col("p.b")), k1)
    if (k2 == 0) return m1
    graft.functions.BpeEncode.register(df.sparkSession)
    val spec1 = m1.map { case (a, b) => s"$a $b" }.mkString("\n")
    val m2 = topPairs(
      wc.select(col("wc"),
          split(call_function("bpe_encode", col("w"), lit(spec1)), " ").as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(col("wc"), explode(transform(
          sequence(lit(0), size(col("ss")) - 2),
          i => struct(element_at(col("ss"), i + 1).as("a"),
            element_at(col("ss"), i + 2).as("b")))).as("p"))
        .select(col("wc"), col("p.a"), col("p.b")), k2)
    m1 ++ m2
  }

  /** Apply a ranked merges table to every document: returns
    * `(<idCol>, bpe, n_bpe)` where `bpe` is the space-joined token
    * stream and `n_bpe` its length. Map-only — the merges table rides
    * the plan as an inlined literal (see [[graft.functions.BpeEncode]]),
    * so at 100 TB this is a pure scan stage: no join, no shuffle, no
    * UDF, one codegen'd pass per document. */
  def bpeTokenize(df: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    graft.functions.BpeEncode.register(df.sparkSession)
    val spec = merges.map { case (a, b) => s"$a $b" }.mkString("\n")
    df.select(col(idCol),
        call_function("bpe_encode", col(textCol), lit(spec)).as("bpe"))
      .withColumn("n_bpe", size(tokens(col("bpe"))).cast("long"))
  }

  /** GPT-2 byte-level pre-tokenization split (Radford et al. 2019's
    * tokenizer regex; the HF `tokenizers` ByteLevel pre_tokenizer) —
    * the production split the BPE chain was missing: contractions
    * (`'s 't 're 've 'm 'll 'd`), SPACE-PREFIXED letter/digit/punct
    * runs, and whitespace runs that yield their LAST space to the next
    * word. Without it, token counts (and therefore packing budgets and
    * fertility) drift from what a real trainer sees.
    *
    * The reference pattern ends in `\s+(?!\S)|\s+` — a lookahead RE2
    * (DuckDB) cannot run. This renders it RE2-SAFE and provably
    * equivalent: one `regexp_replace` inserts a sentinel before every
    * (whitespace, non-whitespace) boundary — exactly the positions the
    * lookahead backtrack would split — then the lookahead-free
    * alternation extracts within each protected segment. The property
    * spec checks the rendering against the true-lookahead Java regex
    * on adversarial fixtures. Pieces CONCATENATE back to the input
    * (the split is a partition — the invertibility contract). Map-only:
    * two regex passes + a lambda, no shuffle, no UDF. Input text must
    * not contain U+001E (the sentinel; in-plan raise otherwise). */
  def gpt2PreTokens(text: Column): Column = {
    val sep = "\u001e"
    val guarded = when(text.contains(sep),
      raise_error(lit("gpt2PreTokens: input contains U+001E (the " +
        "protected-split sentinel) — strip or remap it upstream")))
      .otherwise(text)
    val prot = regexp_replace(guarded, "(\\s)(\\S)", sep + "$1$2")
    val pat = "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+" +
      "| ?[^\\s\\p{L}\\p{N}]+|\\s+"
    flatten(transform(split(prot, sep),
      p => regexp_extract_all(p, lit(pat), lit(0))))
  }

  /** [[gpt2PreTokens]] with GPT-2's byte-to-printable mapping applied to
    * the whitespace a piece carries (space→Ġ U+0120, the byte+256
    * convention for \t \n  \f \r), so pieces contain NO raw
    * whitespace and can ride the space-joined token-stream convention
    * every kernel here uses ([[graft.functions.BpeEncode]] splits words
    * on whitespace — mapped pieces pass through it as single words,
    * leading space preserved as a symbol exactly like the real byte-
    * level BPE). */
  def gpt2MappedPieces(text: Column): Column =
    transform(gpt2PreTokens(text), p => translate(p,
      " \t\n\u000b\u000c\r", "\u0120\u0109\u010a\u010b\u010c\u010d"))

  /** The trainer-visible tokenization chain: GPT-2 pre-tokenize, map
    * whitespace to printables, then apply a ranked merges table to each
    * piece — [[bpeTokenize]] upgraded from the whitespace-word proxy to
    * the production split. Still map-only (the merges table rides the
    * plan as a foldable literal): no join, no shuffle, one codegen'd
    * pass. Returns `(<idCol>, pretok, n_pieces, bpe, n_bpe)` — `pretok`
    * the space-joined mapped pieces, `bpe` the space-joined token
    * stream over them. */
  def bpeTokenizeGpt2(df: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    graft.functions.BpeEncode.register(df.sparkSession)
    val spec = merges.map { case (a, b) => s"$a $b" }.mkString("\n")
    df.select(col(idCol), gpt2MappedPieces(col(textCol)).as("__ps"))
      .select(col(idCol), array_join(col("__ps"), " ").as("pretok"),
        size(col("__ps")).cast("long").as("n_pieces"))
      .withColumn("bpe",
        call_function("bpe_encode", col("pretok"), lit(spec)))
      .withColumn("n_bpe", size(tokens(col("bpe"))).cast("long"))
  }

  /** Deterministic BPE vocabulary from a tokenized corpus: every
    * distinct piece the merges table produces, with dense integer ids in
    * lexicographic piece order — the id assignment an oracle (or another
    * engine) can replay exactly. The distributed part is the distinct
    * over the exploded piece relation; the ranking happens on the DRIVER
    * over the collected vocab (≤ maxVocab rows — a BPE vocab is
    * tens of thousands of pieces by construction, never corpus-sized),
    * the bounded-collect pattern the codebook/centroid inlines use —
    * NOT an unpartitioned rank window, which the global plan audit
    * rightly forbids. Returns `(piece: string, token_id: int)`. */
  def buildBpeVocab(df: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", maxVocab: Int = 262144): DataFrame = {
    val pieces = bpeTokenize(df, merges, textCol, df.columns.head)
      .select(explode(tokens(col("bpe"))).as("piece")).distinct()
      .limit(maxVocab + 1).collect().map(_.getString(0))
    require(pieces.length <= maxVocab,
      s"vocab exceeds maxVocab=$maxVocab pieces — raise the bound or " +
        "shrink the merges table; the piece→id ranking collects to the driver")
    val spark = df.sparkSession
    import spark.implicits._
    pieces.sorted.zipWithIndex.map { case (p, i) => (p, i) }
      .toSeq.toDF("piece", "token_id")
  }

  /** Persist the vocab ([[buildBpeVocab]]) — train the tokenizer once,
    * encode every later batch against the STORED piece→id table (the
    * signature-store discipline applied to the tokenizer). */
  def writeBpeVocab(df: DataFrame, merges: Seq[(String, String)],
      path: String, textCol: String = "text"): Unit =
    buildBpeVocab(df, merges, textCol).write.mode("overwrite").parquet(path)

  /** Persist a learned merges table as `(rnk: int, a, b)` parquet — the
    * other half of the tokenizer store: with merges AND vocab persisted,
    * a nightly batch encodes with ZERO learning passes (q_x42 registers
    * that shape; [[readBpeMerges]] restores rank order). */
  def writeBpeMerges(spark: SparkSession, merges: Seq[(String, String)],
      path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rnk", "a", "b").write.mode("overwrite").parquet(path)
  }

  /** Restore a persisted merges table in rank order. The collect is
    * bounded by construction: a merges table is the learned artifact
    * (dozens to tens of thousands of rows), never corpus-sized. */
  def readBpeMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy(col("rnk"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq

  /** Learn a unigram-LM (SentencePiece-style) piece table from the
    * corpus — the [[learnBpeMerges]] stance applied to the OTHER
    * standard subword tokenizer: candidates are every within-word
    * substring of length 1..`maxLen` (weighted by word occurrence), the
    * vocabulary the top `vocabSize` by (count desc, piece asc), and the
    * micro log-prob QUANTIZED TO THE EXPONENT:
    * `wm = −(bitlen(total) − bitlen(count)) · 1e6` (floor-log2 of the
    * piece's corpus probability, in micro-bits). The quantization is
    * the point, not a shortcut: `ln(count/total)` would put two
    * engines' libm in a race in the last ulp (the ndcgDiscountsM
    * lesson), while bit-length is EXACT integer arithmetic both engines
    * (`bin()`) compute identically — the Viterbi DP is agnostic to
    * where its micros came from, and finer mantissa precision is a
    * training-recipe question, not engine machinery. Two aggregations +
    * one bounded collect of ≤ vocabSize rows (the piece table is the
    * artifact; the DuckDB oracle re-derives it from the same parquet
    * with the same statistics — what lets q_x73 hash-check the whole
    * tokenizer end to end). */
  def learnUnigramPieces(df: DataFrame, textCol: String = "text",
      maxLen: Int = 4, vocabSize: Int = 256): Seq[(String, Long)] = {
    require(maxLen >= 1 && maxLen <= 16, s"need 1 <= maxLen <= 16, got $maxLen")
    require(vocabSize >= 1 && vocabSize <= 65536,
      s"need 1 <= vocabSize <= 65536, got $vocabSize")
    val wc = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("occ"))
    val cand = (1 to maxLen).map { k =>
      wc.filter(length(col("w")) >= k)
        .select(col("w"), col("occ"),
          explode(sequence(lit(1), length(col("w")) - lit(k - 1))).as("i"))
        .select(col("w").substr(col("i"), lit(k)).as("piece"), col("occ"))
    }.reduce(_ unionAll _)
      .groupBy(col("piece")).agg(sum(col("occ")).as("cnt"))
    val total = cand.agg(coalesce(sum(col("cnt")), lit(0L)))
      .first().getLong(0)
    require(total > 0, "learnUnigramPieces: empty corpus")
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    cand.orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
      .collect()
      .map(r => (r.getString(0),
        -(bitlen(total) - bitlen(r.getLong(1))).toLong * 1000000L))
      .toSeq
  }

  /** Apply a unigram piece table to every document: returns
    * `(<idCol>, sp, n_sp)` with `sp` the Viterbi piece stream
    * ([[graft.functions.UnigramEncode]]: U+001F-separated pieces, each
    * word's first piece `▁`-marked) and `n_sp` its piece count. Map-only
    * — the piece table rides the plan as an inlined literal, so at
    * 100 TB this is a pure codegen'd scan stage: no join, no shuffle,
    * one memoized DP per distinct word per task. */
  def unigramTokenize(df: DataFrame, pieces: Seq[(String, Long)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(pieces.nonEmpty, "need a non-empty piece table")
    graft.functions.UnigramEncode.register(df.sparkSession)
    val spec = pieces.sortBy(_._1)
      .map { case (p, w) => s"$p\t$w" }.mkString("\n")
    df.select(col(idCol),
        call_function("unigram_encode", col(textCol), lit(spec)).as("sp"))
      .withColumn("n_sp",
        when(length(col("sp")) === 0, lit(0L))
          .otherwise(size(split(col("sp"),
            graft.functions.UnigramEncode.Sep)).cast("long")))
  }

  /** Persist a learned unigram piece table as `(piece, wm)` parquet —
    * the tokenizer-store discipline ([[writeBpeMerges]]): train once,
    * encode every later batch with zero learning passes. */
  def writeUnigramPieces(spark: SparkSession, pieces: Seq[(String, Long)],
      path: String): Unit = {
    import spark.implicits._
    pieces.toDF("piece", "wm").write.mode("overwrite").parquet(path)
  }

  /** Restore a persisted piece table (piece order normalized — the DP
    * is order-independent, the spec literal is made deterministic by
    * [[unigramTokenize]]'s sort). Bounded by construction: a piece
    * table is the learned artifact, never corpus-sized. */
  def readUnigramPieces(spark: SparkSession, path: String): Seq[(String, Long)] =
    spark.read.parquet(path).orderBy(col("piece"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Deterministic WordPiece vocabulary (the BERT-family tokenizer's
    * artifact — the third subword scheme, completing BPE + unigram):
    * word substrings up to `maxLen` code points ranked by corpus
    * occurrence, position-classed — a word-INITIAL substring is a
    * plain piece, a word-internal one carries the `##` continuation
    * prefix (the WordPiece vocabulary distinguishes them; "able" the
    * word-start and "##able" the suffix are different inventory
    * items). Top `vocabSize` by (count desc, piece asc) — the
    * deterministic cut both engines replay; full single-char coverage
    * is NOT forced, so rare characters honestly `[UNK]` entire words
    * (the BERT cliff [[graft.functions.WordPieceEncode]] implements,
    * surfaced as `n_unk`). Same bounded-driver-collect shape as
    * [[learnUnigramPieces]]: the candidate relation aggregates
    * distributed, only the ≤vocabSize cut collects. */
  def learnWordPieceVocab(df: DataFrame, textCol: String = "text",
      maxLen: Int = 4, vocabSize: Int = 64): Seq[String] = {
    require(maxLen >= 1 && maxLen <= 16, s"need 1 <= maxLen <= 16, got $maxLen")
    require(vocabSize >= 1 && vocabSize <= 65536,
      s"need 1 <= vocabSize <= 65536, got $vocabSize")
    val wc = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("occ"))
    (1 to maxLen).map { k =>
      wc.filter(length(col("w")) >= k)
        .select(col("w"), col("occ"),
          explode(sequence(lit(1), length(col("w")) - lit(k - 1))).as("i"))
        .select(when(col("i") === 1, col("w").substr(col("i"), lit(k)))
          .otherwise(concat(lit("##"), col("w").substr(col("i"), lit(k))))
          .as("piece"), col("occ"))
    }.reduce(_ unionAll _)
      .groupBy(col("piece")).agg(sum(col("occ")).as("cnt"))
      .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
      .collect().map(_.getString(0)).toSeq
  }

  /** Apply a WordPiece vocabulary to every document: returns
    * `(<idCol>, wp, n_wp, n_unk)` with `wp` the greedy
    * longest-match-first piece stream ([[graft.functions
    * .WordPieceEncode]]: U+001F-separated, continuations `##`-marked,
    * unmatchable words `[UNK]`) and `n_unk` the stream's `[UNK]`
    * count — the tokenizer-coverage monitor (a rising n_unk on a new
    * batch means the stored vocab no longer fits the data). Map-only:
    * the vocabulary rides the plan as an inlined literal, one
    * memoized greedy scan per distinct word per task. */
  def wordPieceTokenize(df: DataFrame, vocab: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(vocab.nonEmpty, "need a non-empty vocabulary")
    graft.functions.WordPieceEncode.register(df.sparkSession)
    val spec = vocab.sorted.mkString("\n")
    val sep = graft.functions.WordPieceEncode.Sep
    df.select(col(idCol),
        call_function("wordpiece_encode", col(textCol), lit(spec)).as("wp"))
      .withColumn("n_wp",
        when(length(col("wp")) === 0, lit(0L))
          .otherwise(size(split(col("wp"), sep)).cast("long")))
      .withColumn("n_unk",
        when(length(col("wp")) === 0, lit(0L))
          .otherwise(size(filter(split(col("wp"), sep),
            p => p === graft.functions.WordPieceEncode.Unk)).cast("long")))
  }

  /** Persist a learned WordPiece vocabulary — the tokenizer-store
    * discipline: train once, encode every later batch with zero
    * learning passes. */
  def writeWordPieceVocab(spark: SparkSession, vocab: Seq[String],
      path: String): Unit = {
    import spark.implicits._
    vocab.toDF("piece").write.mode("overwrite").parquet(path)
  }

  /** Restore a persisted WordPiece vocabulary (order normalized — the
    * greedy scan is set-driven, [[wordPieceTokenize]] sorts the spec
    * literal). Bounded by construction: a vocabulary is the learned
    * artifact, never corpus-sized. */
  def readWordPieceVocab(spark: SparkSession, path: String): Seq[String] =
    spark.read.parquet(path).orderBy(col("piece"))
      .collect().map(_.getString(0)).toSeq

  /** Encode documents to integer token-id sequences — the handoff format
    * a training pipeline actually ships. Pieces come from the map-only
    * [[bpeTokenize]] kernel; ids from a broadcast join against the
    * vocab-sized piece→id table; the one keyed shuffle reassembles each
    * doc's ids in stream order. A piece absent from the vocab (a NEW
    * batch encoded against a stored vocab) maps to −1, the conventional
    * unk sentinel — never silently dropped, so `n_tokens` always equals
    * the tokenizer's output length. Token-less docs keep an empty array.
    * Returns `(<idCol>, token_ids: array<int>, n_tokens: long)`. */
  def encodeTokenIds(df: DataFrame, merges: Seq[(String, String)],
      vocab: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val bpe = bpeTokenize(df, merges, textCol, idCol)
    val pieces = bpe
      .select(col(idCol), posexplode(tokens(col("bpe"))).as(Seq("pos", "piece")))
    val ids = pieces
      .join(broadcast(vocab.select(col("piece"), col("token_id"))),
        Seq("piece"), "left")
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"),
          coalesce(col("token_id"), lit(-1)).as("tid")))),
        s => s.getField("tid")).as("token_ids"))
    bpe.select(col(idCol), col("n_bpe").as("n_tokens"))
      .join(ids, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("token_ids"),
          array().cast("array<int>")).as("token_ids"),
        col("n_tokens"))
  }

  /** Byte-fallback token-id encoding — the production tokenizer contract
    * (the GPT-2 / SentencePiece `byte_fallback` convention): no token is
    * ever unk. Ids 0–255 are reserved for raw bytes; learned-piece ids
    * shift up by 256. A piece found in the vocab encodes as its single
    * shifted id; a piece ABSENT from the vocab (a new batch encoded
    * against a stored vocab) decomposes to its UTF-8 bytes, each mapped
    * to its byte id — so unseen words, scripts, and mojibake all encode
    * losslessly instead of collapsing to a −1 sentinel.
    *
    * Same scale shape as [[encodeTokenIds]]: map-only BPE kernel,
    * broadcast vocab join, one keyed shuffle to reassemble stream order.
    * The byte decomposition is pure codegen'd column algebra (hex of the
    * UTF-8 bytes → 2-char chunks → ints), no UDF. Each row also proves
    * its own invertibility: `roundtrip_ok` rebuilds every fallback
    * piece from the emitted byte ids and compares, and vocab hits are
    * identity by join construction. Returns
    * `(<idCol>, token_ids: array<int>, n_tokens, roundtrip_ok)` —
    * `n_tokens` counts emitted ids (≥ the piece count when fallbacks
    * split), null for null text, and `token_ids` never contains −1. */
  def encodeTokenIdsByteFallback(df: DataFrame, merges: Seq[(String, String)],
      vocab: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val bpe = bpeTokenize(df, merges, textCol, idCol)
    val pieces = bpe
      .select(col(idCol), posexplode(tokens(col("bpe"))).as(Seq("pos", "piece")))
    val hexStr = lower(hex(encode(col("piece"), "UTF-8")))
    val byteIds = transform(
      sequence(lit(1), (length(hexStr) / 2).cast("int")),
      i => conv(hexStr.substr(i * 2 - 1, lit(2)), 16, 10).cast("int"))
    val rebuilt = decode(unhex(concat_ws("",
      transform(byteIds, b => lpad(hex(b), 2, "0")))), "UTF-8")
    val ids = pieces
      .join(broadcast(vocab.select(col("piece"), col("token_id"))),
        Seq("piece"), "left")
      .select(col(idCol), col("pos"),
        when(col("token_id").isNotNull,
          array((col("token_id") + 256).cast("int")))
          .otherwise(byteIds).as("ids"),
        (col("token_id").isNotNull || rebuilt === col("piece")).as("rt"))
      .groupBy(col(idCol))
      .agg(
        flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("ids")))),
          s => s.getField("ids"))).as("token_ids"),
        expr("bool_and(rt)").as("roundtrip_ok"))
    bpe.select(col(idCol), col("n_bpe"))
      .join(ids, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("token_ids"), array().cast("array<int>")).as("token_ids"),
        when(col("n_bpe").isNull, lit(null).cast("long"))
          .otherwise(size(coalesce(col("token_ids"),
            array().cast("array<int>"))).cast("long")).as("n_tokens"),
        coalesce(col("roundtrip_ok"), lit(true)).as("roundtrip_ok"))
  }

  /** Append a heavy-hitters (frequent-items) sketch of the corpus token
    * stream — the [[graft.queries.TextQueries]] q_x6 top-tokens STORE
    * twin, and the third mergeable-sketch family (HLL distinct, theta
    * sets, KLL quantiles, now frequent items): exact token counts
    * cannot merge across batches without re-aggregating the union, a
    * frequent-items sketch can. Nightly batches append one sketch row
    * each; vocabulary-drift monitoring then reads the sketches-sized
    * store, never the corpora. `maxItemsTracked` bounds the sketch —
    * BELOW it the counts are exact, so at the registered settings the
    * store replays q_x6's exact oracle verbatim. */
  def appendTopTokenSketch(df: DataFrame, textCol: String, path: String,
      maxItemsTracked: Int = 100000): Unit =
    df.select(explode(tokens(col(s"`$textCol`"))).as("token"))
      .agg(expr(s"approx_top_k_accumulate(token, $maxItemsTracked)").as("sketch"))
      .write.mode("append").parquet(path)

  /** Top-k tokens from a sketch store written by
    * [[appendTopTokenSketch]]: one combine aggregation over the store,
    * a deep estimate (50·k, far past any top-k tie ambiguity in the
    * exact regime), then the deterministic re-rank (count desc, token
    * asc) q_x6 uses — `TakeOrderedAndProject`, never a full sort. */
  def topTokensFromSketches(spark: SparkSession, path: String,
      k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    spark.read.parquet(path)
      .agg(expr("approx_top_k_combine(sketch)").as("comb"))
      .select(explode(expr(s"approx_top_k_estimate(comb, ${k * 50})")).as("e"))
      .select(col("e.item").as("token"), col("e.count").as("n"))
      .orderBy(col("n").desc, col("token")).limit(k)
  }

  /** Canonical URL key — the first-pass dedup key a web corpus groups on
    * before any content hashing (the same page arrives as `HTTP://X.COM`,
    * `http://x.com:80/`, and `http://x.com/?utm_source=…`). Deterministic
    * string rules, all map-only and exactly replayable in a relational
    * oracle:
    *   - fragment dropped; scheme and authority lowercased (paths stay
    *     case-sensitive per the URL spec);
    *   - default ports stripped (`:80` for http, `:443` for https);
    *   - tracking params removed (`utm_*`, `fbclid`, `gclid`), remaining
    *     query params sorted bytewise, empty params dropped;
    *   - a single trailing slash stripped from non-root paths.
    * A value with no `scheme://` prefix passes through unchanged —
    * refusing to guess beats inventing a canonicalization for relative
    * or garbage values. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth0 = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val auth = when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val path0 = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(length(path0) > 1, regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val q0 = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = filter(split(q0, "&"), p =>
      !(p.rlike("^(utm_[^=]*|fbclid|gclid)(=.*)?$") || p === lit("")))
    val qsorted = array_join(array_sort(params), "&")
    when(scheme === "", url).otherwise(
      concat(scheme, lit("://"), auth, path,
        when(qsorted === "", lit("")).otherwise(concat(lit("?"), qsorted))))
  }

  /** How many tokens appear in `words` (language/stopword hit count). */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Blocklist gate — the word-list filter every curation stack runs
    * (NSFW/toxicity/spam term lists): per doc, the count and ratio of
    * LOWERCASED tokens hitting the list, and a keep verdict at
    * `maxRatio` (ratio STRICTLY above flags; a token-less doc has
    * nothing to flag and keeps). Map-only — the list rides the plan as
    * an inlined literal array like the langid stopwords; production
    * lists in the thousands stay well inside literal-dispatch territory,
    * beyond that swap to a broadcast-join variant of the same relation.
    * Returns `(<idCol>, n_tokens, n_blocked, blocked_ratio, keep)`. */
  def blocklistFilter(df: DataFrame, terms: Seq[String], maxRatio: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "need at least one blocklist term")
    require(maxRatio >= 0, s"maxRatio must be >= 0, got $maxRatio")
    val lowered = terms.map(_.toLowerCase)
    val toksed = df.select(col(idCol),
      tokens(lower(col(s"`$textCol`"))).as("__t"))
    toksed.select(col(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        hitCount(col("__t"), lowered).cast("long").as("n_blocked"))
      .withColumn("blocked_ratio",
        when(col("n_tokens") > 0,
          round(col("n_blocked").cast("double") / col("n_tokens"), 6))
          .otherwise(lit(0.0)))
      .withColumn("keep", col("blocked_ratio") <= maxRatio)
  }

  /** Host-level quality gate — the RefinedWeb/C4 step document-level
    * filters can't express: a host whose documents are MOSTLY bad is
    * evidence the whole host is spam/SEO-farm/boilerplate, so its
    * remaining "good-looking" documents go too. Each doc carries a
    * caller-computed boolean bad flag (compose with [[qualityScore]] /
    * [[gopherRules]] / [[c4Rules]] verdicts); hosts with at least
    * `minDocs` documents and a bad fraction STRICTLY above
    * `maxBadRatio` are dropped wholesale. Hosts below the evidence bar,
    * and docs whose URL has no parseable `scheme://authority` (host
    * null — refusing to guess, the [[canonicalUrl]] philosophy), are
    * kept: absence of evidence never drops data. A NULL bad flag counts
    * as not-bad — compute flags null-safely upstream.
    *
    * Shape: host extraction is one map-side projection (authority
    * lowercased, `:port` stripped); per-host stats are ONE hash
    * aggregation on the host key; the verdict joins back keyed by host
    * — the stats side is hosts-sized (≪ docs), so AQE broadcasts it
    * while it fits and falls back to a keyed shuffle join beyond that.
    * Returns `(<idCol>, host, host_docs, host_bad, bad_ratio, keep)`
    * with host stats null for unparseable-host docs. */
  def hostQualityGate(df: DataFrame, urlCol: String, badCol: String,
      maxBadRatio: Double, minDocs: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(maxBadRatio >= 0 && maxBadRatio <= 1,
      s"maxBadRatio must be in [0, 1], got $maxBadRatio")
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val auth = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = when(coalesce(auth, lit("")) === "", lit(null))
      .otherwise(lower(regexp_replace(auth, ":[0-9]+$", "")))
    val tagged = df.select(col(idCol), host.as("host"),
      col(s"`$badCol`").cast("boolean").as("__bad"))
    val stats = tagged.filter(col("host").isNotNull)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("host_docs"),
        sum(when(col("__bad"), 1L).otherwise(0L)).as("host_bad"))
      .withColumn("bad_ratio",
        round(col("host_bad").cast("double") / col("host_docs"), 6))
    tagged.join(stats, Seq("host"), "left")
      .select(col(idCol), col("host"), col("host_docs"), col("host_bad"),
        col("bad_ratio"),
        (col("host").isNull || col("host_docs") < minDocs ||
          col("bad_ratio") <= maxBadRatio).as("keep"))
  }

  /** Web-graph host-quality signal — the RefinedWeb/CommonCrawl
    * host-ranking gate composed from parts that already existed but
    * were never wired: document URLs canonicalize ([[canonicalUrl]]),
    * reduce to hosts, out-links build the DISTINCT host→host link
    * graph, [[graft.operators.Graph.pageRank]] ranks it, and each
    * document gets its host's centrality back as a quality feature —
    * the corpus-level signal document-level filters can't see (a page
    * on a never-cited host farm scores low however clean its text).
    *
    * `docs` carries each document's own URL; `links` carries the
    * out-link URLs found in documents (0..n rows per doc). Self-links
    * (same host) drop — they assert no cross-host endorsement; link
    * multiplicity collapses (DISTINCT host pairs — the host-graph
    * convention). Docs with an unparseable host, or whose host has no
    * edge at all (isolated — PageRank never sees it), surface with a
    * null rank: absence of evidence is visible, never invented.
    *
    * Scale shape: host extraction is map-only; the edge build is one
    * doc-keyed join + one distinct on the (src, dst) HOST grain (hosts
    * ≪ docs); PageRank runs over the host graph (its per-round cost is
    * the host-edge relation, not the corpus); the feature join back is
    * keyed by host — hosts-sized, AQE-broadcast while it fits. Returns
    * `(<idCol>, host, host_rank)` — one row per input doc. */
  def hostRankFeature(docs: DataFrame, urlCol: String,
      links: DataFrame, linkUrlCol: String, iters: Int = 3,
      idCol: String = "doc_id"): DataFrame = {
    def hostOf(u: Column): Column = {
      val canon = canonicalUrl(u)
      val auth = regexp_extract(canon,
        "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
      // strip URL userinfo ('user@h1.com' would split one real host
      // into multiple graph nodes); canonicalUrl preserves it upstream
      val bare = regexp_replace(auth, "^[^/@]*@", "")
      when(coalesce(bare, lit("")) === "", lit(null))
        .otherwise(lower(regexp_replace(bare, ":[0-9]+$", "")))
    }
    val docHost = docs.select(col(idCol), hostOf(col(urlCol)).as("host"))
    val linkHost = links.select(col(idCol),
      hostOf(col(s"`$linkUrlCol`")).as("__lh"))
    val edges = docHost.join(linkHost, Seq(idCol))
      .filter(col("host").isNotNull && col("__lh").isNotNull &&
        col("host") =!= col("__lh"))
      .select(col("host").as("src"), col("__lh").as("dst"))
      .distinct()
    val pr = Graph.pageRank(edges, iters)
    docHost.join(
        pr.select(col("node").as("host"), col("rank").as("host_rank")),
        Seq("host"), "left")
      .select(col(idCol), col("host"), col("host_rank"))
  }

  /** Token-distribution KL drift — the TEXT sibling of
    * [[graft.operators.Profile.psiDrift]] (which bins NUMERIC columns):
    * how far has a new corpus batch's unigram token distribution moved
    * from the reference's? Both directions of
    * KL(P‖Q) = Σ_t p_t·ln(p_t/q_t) over the UNION vocabulary with
    * add-1 smoothing (so a token unseen on one side contributes a
    * finite, honest penalty instead of ∞/undefined — the Laplace
    * convention the perplexity rung already uses). A KL jump on a
    * corpus refresh is the "this crawl is not like the last one"
    * alarm a mixture owner acts on before retraining anything.
    *
    * Determinism: every ln input is a ratio of exact integers
    * (counts + 1, totals + V), each per-token term rounds to 6 dp as
    * DECIMAL and sums exactly (order-independent — the [[duckPpl]]-
    * style discipline), final numbers in micro-nats. Scale: two
    * corpus-sized token aggregations + one union-vocab-keyed join —
    * no window, no sort. Returns ONE row `(n_a, n_b, vocab_size,
    * kl_ab_micro, kl_ba_micro)` — ALWAYS one row: two empty/all-null
    * corpora have no vocabulary and no defined KL, so the row reads
    * `(0, 0, 0, null, null)` (an honest degenerate, never zero rows —
    * a monitoring consumer reading head() must see the verdict). */
  def tokenKlDrift(a: DataFrame, b: DataFrame,
      textCol: String = "text"): DataFrame = {
    def counts(df: DataFrame): DataFrame =
      Par.spread(df.filter(col(textCol).isNotNull)
          .select(tokens(lower(col(textCol))).as("toks")))
        .select(explode(col("toks")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    tokenKlFromCounts(counts(a), counts(b))
  }

  /** [[tokenKlDrift]]'s derivation half, split out so the STREAMED
    * token-count state ([[graft.streaming.EventStreams.tokenCountState]]
    * — monotone per-token counters, the embeddingDimStats stance) can
    * feed the identical KL arithmetic: both inputs are `(tok, c)` count
    * relations (c > 0 rows; a token absent from a side is simply not a
    * row — the full join restores it with count 0). Same numerics,
    * same always-one-row contract as the batch composition. */
  def tokenKlFromCounts(aCounts: DataFrame, bCounts: DataFrame,
      tokCol: String = "tok", countCol: String = "c"): DataFrame = {
    def side(df: DataFrame, s: String): DataFrame =
      df.select(col(tokCol).as("tok"),
        col(countCol).cast("long").as(s"c_$s"))
    val joined = side(aCounts, "a").join(side(bCounts, "b"),
        Seq("tok"), "full")
      .select(col("tok"), coalesce(col("c_a"), lit(0L)).as("ca"),
        coalesce(col("c_b"), lit(0L)).as("cb"))
      .localCheckpoint()
    // agg-without-groupBy on BOTH reductions: each is one row even over
    // an empty vocabulary, so the degenerate corpus surfaces as a row
    val tot = joined.agg(coalesce(sum(col("ca")), lit(0L)).as("n_a"),
      coalesce(sum(col("cb")), lit(0L)).as("n_b"),
      count(lit(1)).as("vocab_size"))
    val kl = joined.crossJoin(broadcast(tot))
      .select(
        // p/q with add-1 over the union vocab; each term 6-dp rounded
        // DECIMAL so the sum is exact and order-independent
        expr("CAST(ROUND((CAST(ca + 1 AS DOUBLE) / (n_a + vocab_size)) " +
          "* ln((CAST(ca + 1 AS DOUBLE) * (n_b + vocab_size)) " +
          "/ (CAST(cb + 1 AS DOUBLE) * (n_a + vocab_size))), 6) " +
          "AS DECIMAL(18,6))").as("__ta"),
        expr("CAST(ROUND((CAST(cb + 1 AS DOUBLE) / (n_b + vocab_size)) " +
          "* ln((CAST(cb + 1 AS DOUBLE) * (n_a + vocab_size)) " +
          "/ (CAST(ca + 1 AS DOUBLE) * (n_b + vocab_size))), 6) " +
          "AS DECIMAL(18,6))").as("__tb"))
      .agg((sum(col("__ta")) * 1000000L).cast("long").as("kl_ab_micro"),
        (sum(col("__tb")) * 1000000L).cast("long").as("kl_ba_micro"))
    tot.crossJoin(kl)
  }

  /** Small built-in stopword lists for the n-gram language-ID heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "y", "es", "un", "en"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "dans"))

  /** Language-ID: argmax of stopword hits with a fixed priority order
    * (first language wins ties — deterministic across engines). */
  def langId(toks: Column): Column = {
    val scores = langStopwords.map { case (l, ws) => l -> hitCount(toks, ws) }
    def argmax(rest: List[(String, Column)]): Column = rest match {
      case (l, _) :: Nil => lit(l)
      case (l, s) :: tail =>
        when(tail.map(_._2).foldLeft(lit(true))((acc, o) => acc && s >= o), lit(l))
          .otherwise(argmax(tail))
      case Nil => lit(null)
    }
    argmax(scores.toList)
  }

  /** Per-document min-hash fingerprint: lexicographic min of the md5'd
    * shingle set — a compact, order-independent document signature. */
  def fingerprint(shingleSet: Column): Column =
    array_min(transform(shingleSet, s => md5(s)))

  /** Per-document n-gram occurrence counts `(sid, gram, cnt)` — the base
    * relation for the repetition metrics. One explode + one keyed hash
    * aggregation; partial aggregation collapses each map task's grams
    * before the shuffle, so the exchanged volume is the per-doc DISTINCT
    * gram count, not the token stream. */
  def ngramCounts(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    Par.spread(df.select(col(idCol).as("sid"), tokens(col(textCol)).as("toks")))
      .select(col("sid"), explode(shingles(col("toks"), n)).as("gram"))
      .groupBy(col("sid"), col("gram")).agg(count(lit(1)).as("cnt"))

  /** Gopher-style repetition signals (Rae et al. 2021, §A1.1: filtering
    * documents dominated by repeated fragments — a top pretraining-data
    * quality gate):
    *
    *   - `dup_token_frac`   — fraction of tokens that are repeats of an
    *     earlier token (1 − distinct/total);
    *   - `top_2gram`/`top_2gram_frac` — the most frequent word 2-gram and
    *     occurrences × gram length over document characters — an UPPER
    *     BOUND on the character coverage Gopher describes, not coverage
    *     itself: overlapping occurrences double-count shared characters
    *     (and the gram's internal space), so the ratio can exceed 1 on
    *     degenerate repeats ("a a a a" → 9/7). True coverage would need
    *     per-doc interval union — a per-row O(occurrences) merge the
    *     bound dodges; as a filter signal the bound is conservative in
    *     the right direction (repetitive docs score HIGHER);
    *   - `dup_3gram_frac`   — same occurrence-count × gram-length bound,
    *     over 3-gram occurrences BEYOND each gram's first (the
    *     duplicate-n-gram mass); may exceed 1 the same way.
    *
    * Deterministic: the top gram ties break (count desc, gram asc) via two
    * hash aggregations and an equi-join on the per-doc max — no window, no
    * sort, so the shape survives a corpus-scale shuffle. Fractions are
    * single double divisions of exact integer counts rounded to 6 dp. */
  def repetitionMetrics(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // distinct_count, not size(array_distinct(..)): this site is MAP-ONLY
    // (no exchange whose aggregation could absorb the count — the dedup
    // sizes lesson does not apply here), and the interpreted HOF does
    // O(n²) string compares per doc where the kernel does one O(n) hash
    // pass. A/B at sf0.1 (back-to-back ×2): q_x10 is a WASH (1.42-1.46 →
    // 1.41-1.47 — the two ngramCounts explode+agg passes dominate this
    // query, not the count), q_x16 wins ~15% (0.36-0.37 → 0.30-0.33).
    // Kept: equal-or-better now, and the HOF's O(n²) term grows with doc
    // length while the kernel stays linear.
    // BENCH_r06's 4.36s for q_x10 does NOT reproduce in isolation:
    // `ScaleProbe iso` across 3 fresh JVMs (r7) measured 1.79/2.95/2.05s
    // at sf0.1, with all co-probed queries moving in lockstep run-to-run
    // — in-suite timing after ~110 queries of heap/page-cache churn plus
    // box load, not a code regression (code unchanged since the 1.41s
    // A/B above). SCALE.md round-7 table is the record.
    graft.functions.DistinctCount.register(df.sparkSession)
    val base = df.select(col(idCol).as("sid"), length(col(textCol)).as("n_chars"),
      tokens(col(textCol)).as("toks"))
    val tok = base.select(col("sid"), col("n_chars"),
      size(col("toks")).as("n_tokens"),
      call_function("distinct_count", col("toks")).as("n_distinct"))
    val g2 = ngramCounts(df, textCol, idCol, 2)
    val mx2 = g2.groupBy(col("sid")).agg(max(col("cnt")).as("mc"))
    val top2 = g2.join(mx2, Seq("sid")).filter(col("cnt") === col("mc"))
      .groupBy(col("sid"))
      .agg(min(col("gram")).as("top_2gram"), max(col("cnt")).as("top_2gram_cnt"))
    val dup3 = ngramCounts(df, textCol, idCol, 3)
      .filter(col("cnt") > 1)
      .groupBy(col("sid"))
      .agg(sum((col("cnt") - 1) * length(col("gram"))).as("dup3_chars"))
    tok.join(top2, Seq("sid"), "left").join(dup3, Seq("sid"), "left")
      .select(col("sid").as("doc_id"), col("n_tokens"),
        round((col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens"), 6)
          .as("dup_token_frac"),
        col("top_2gram"),
        round((col("top_2gram_cnt") * length(col("top_2gram"))).cast("double") /
          col("n_chars"), 6).as("top_2gram_frac"),
        coalesce(round(col("dup3_chars").cast("double") / col("n_chars"), 6), lit(0.0))
          .as("dup_3gram_frac"))
  }

  /** Model-based quality scoring: logistic inference over the document
    * quality features — the distributed shape of the classifier gate
    * public pipelines run (a fastText/linear quality model scored over
    * every document; CCNet/DCLM lineage). The model here is a FIXED
    * deterministic weight vector (training a real classifier needs
    * labels this corpus doesn't have); the inference plumbing — feature
    * projection, dot product, sigmoid, threshold — is the production
    * shape: pure map-side column arithmetic inside codegen, no UDF.
    * Determinism: features are exact-rounded upstream, and the final
    * sigmoid is rounded to 6 dp, absorbing ≤1-ulp exp() differences
    * across engines. */
  def qualityScore(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.5): DataFrame = {
    // native O(n) distinct_count for the same reason as repetitionMetrics
    // above: map-only site, O(n²) interpreted HOF replaced in place
    graft.functions.DistinctCount.register(df.sparkSession)
    val toksed = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
    val nTok = size(col("toks"))
    val avgLen = round(length(array_join(col("toks"), "")).cast("double") / nTok, 4)
    val stopRatio = round(hitCount(col("toks"), langStopwords.head._2)
      .cast("double") / nTok, 4)
    val dupFrac = round((nTok - call_function("distinct_count", col("toks")))
      .cast("double") / nTok, 6)
    // weights chosen by inspection: longer docs and stopword presence up,
    // extreme token length and repetition down — stand-ins for trained
    // coefficients, wired as literals exactly like a broadcast model row
    val z = lit(-2.0) + log(nTok.cast("double")) * lit(0.55) +
      avgLen * lit(0.12) + stopRatio * lit(4.0) - dupFrac * lit(1.5)
    toksed.select(col("doc_id"), nTok.as("n_tokens"),
        avgLen.as("avg_token_len"), stopRatio.as("stopword_ratio"),
        dupFrac.as("dup_token_frac"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("quality_score"))
      .withColumn("keep", col("quality_score") >= threshold)
  }

  /** Gopher quality RULES (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", App. A1.1) —
    * the published hard-threshold filter set, complementing the
    * composite [[qualityScore]]: word-count bounds, mean-word-length
    * band, symbol-to-word ratio (#, …, ...), bullet-started and
    * ellipsis-ended line ratios, alphabetic-word ratio, and the
    * ≥2-distinct-stop-words test. `keep` requires every rule to hold;
    * null text is normalized to the empty string FIRST, so both empty
    * and null documents fail the word-count rule deterministically
    * (`keep = false`, ratios null) — the oracle applies the same
    * COALESCE, keeping the two engines cell-identical on null rows.
    *
    * Map-only — one projection, no shuffle, no UDF; every ratio is a
    * single rounded division so the row hashes identically across
    * engines. */
  def gopherRules(df: DataFrame, textCol: String, idCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val tx = coalesce(col(textCol), lit(""))
    val t = df.select(col(idCol).as("doc_id"), tx.as("__t"),
      tokens(tx).as("toks"),
      tokens(lower(tx)).as("ltoks"),
      split(tx, "\n").as("lines"))
    val n = size(col("toks"))
    val nLines = size(col("lines"))
    def occurrences(what: String, width: Int) =
      ((length(col("__t")) - length(expr(s"replace(__t, '$what', '')"))) /
        lit(width)).cast("long")
    val nSym = occurrences("#", 1) + occurrences("…", 1) + occurrences("...", 3)
    val bulletLines = size(filter(col("lines"), l =>
      startswith(l, lit("- ")) || startswith(l, lit("• ")) ||
        startswith(l, lit("* "))))
    val ellipsisLines = size(filter(col("lines"), l =>
      endswith(l, lit("...")) || endswith(l, lit("…"))))
    val alphaWords = size(filter(col("ltoks"), w => w.rlike("[a-z]")))
    def ratio(num: Column, den: Column) =
      when(den > 0, round(num.cast("double") / den, 4))
    val meanLen = ratio(length(array_join(col("toks"), "")), n)
    val symbolRatio = ratio(nSym, n)
    val bulletRatio = ratio(bulletLines, nLines)
    val ellipsisRatio = ratio(ellipsisLines, nLines)
    val alphaRatio = ratio(alphaWords, n)
    val stopHits = size(array_intersect(col("ltoks"),
      typedLit(stops))).cast("long")
    t.select(col("doc_id"), n.cast("long").as("n_words"),
        meanLen.as("mean_word_len"), symbolRatio.as("symbol_ratio"),
        bulletRatio.as("bullet_ratio"), ellipsisRatio.as("ellipsis_ratio"),
        alphaRatio.as("alpha_ratio"), stopHits.as("stop_hits"))
      .withColumn("keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_ratio") <= 0.9 && col("ellipsis_ratio") <= 0.3 &&
          col("alpha_ratio") >= 0.8 && col("stop_hits") >= 2L)
  }

  /** C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    * Transfer Learning…", §2.2) — the OTHER published web-crawl gate
    * next to [[gopherRules]], and the line-granular one: Gopher scores
    * a page, C4 first REWRITES it line by line and then gates the
    * remainder. Implemented faithfully:
    *
    *   - keep only lines that end in a terminal punctuation mark
    *     (`.`, `!`, `?`, `"`), hold at least `minLineWords` words, and
    *     do not mention "javascript" (the cookie/JS-warning boilerplate
    *     rule);
    *   - drop the whole page when the CLEANED text has fewer than
    *     `minSentences` sentences (terminal-punctuation count, C4's own
    *     sentence proxy), when the RAW page contains "lorem ipsum"
    *     (placeholder text), or when it contains a curly bracket `{`
    *     (the it's-probably-code rule).
    *
    * (C4's remaining rules live elsewhere in this engine: the bad-words
    * list is [[blocklistFilter]], three-sentence-span dedup is
    * [[graft.operators.Dedup]]'s span/paragraph family.)
    *
    * Pure map-only higher-order-function pipeline over the line array —
    * no shuffle, no UDF, the same 100 TB shape as every other gate;
    * counts are exact integers so the relational oracle replays it
    * by construction. Returns `(doc_id, n_lines, n_kept, n_sentences,
    * clean_text, keep)` — `clean_text` is the kept lines re-joined, the
    * page payload downstream stages train on when `keep`. */
  def c4Rules(df: DataFrame, textCol: String, idCol: String,
      minLineWords: Int = 5, minSentences: Int = 3): DataFrame = {
    val tx = coalesce(col(textCol), lit(""))
    val t = df.select(col(idCol).as("doc_id"), tx.as("__t"),
      split(tx, "\n").as("__lines"))
    val kept = filter(col("__lines"), l =>
      size(filter(split(l, "\\s+"), w => w =!= "")) >= minLineWords &&
        substring(rtrim(l), -1, 1).isin(".", "!", "?", "\"") &&
        !lower(l).contains("javascript"))
    t.select(col("doc_id"),
        size(col("__lines")).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        array_join(kept, "\n").as("clean_text"),
        col("__t"))
      .withColumn("n_sentences",
        (length(col("clean_text")) -
          length(regexp_replace(col("clean_text"), "[.!?]", ""))).cast("long"))
      .withColumn("keep",
        col("n_sentences") >= minSentences &&
          !lower(col("__t")).contains("lorem ipsum") &&
          !col("__t").contains("{"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        col("n_sentences"), col("clean_text"), col("keep"))
  }

  /** CCNet-style LM-perplexity quality signal (Wenzek et al. 2020,
    * "CCNet: Extracting high quality monolingual datasets from web
    * crawl data"): score every document by the perplexity of a language
    * model and bucket the corpus into head / middle / tail — the
    * standard web-crawl quality gate. The production recipe scores with
    * an offline-trained KenLM; here the LM is an add-α bigram model
    * trained ON THE CORPUS ITSELF in the same job (two hash
    * aggregations), which keeps the whole operator — training AND
    * scoring — replayable by a relational oracle:
    *
    *   p(w2|w1) = (C(w1 w2) + α) / (C(w1) + α·V)
    *   avg_nll  = −(1/n) Σ ln p   (n = doc's bigram count)
    *   ppl      = exp(avg_nll)
    *
    * `headPpl`/`tailPpl` are FIXED thresholds (CCNet likewise ships
    * precomputed per-language cutoffs) — corpus-quantile cutoffs would
    * put an interpolated float on the bucket boundary, which no
    * cross-engine oracle can hash-match. Docs with fewer than 2 tokens
    * get null scores and bucket 'empty'.
    *
    * Determinism: counts are exact integers; each bigram's ln is
    * rounded to 6 dp (absorbing ≤1-ulp ln() differences across engines,
    * the q_x16 contract) and summed as DECIMAL — exact and
    * order-independent, so the distributed aggregation order can't
    * perturb the result; the final exp is rounded to 4 dp.
    *
    * Scale shape: training is two hash aggregations with map-side
    * partials (shuffled volume = distinct bigrams/unigrams, not the
    * token stream); scoring joins the bigram relation to the two count
    * relations by key (AQE broadcasts them while they fit) and reduces
    * per doc. The vocabulary size rides a broadcast 1-row aggregate.
    * No window, no driver-side state, no UDF. */
  def bigramPerplexity(df: DataFrame, textCol: String, idCol: String,
      headPpl: Double, tailPpl: Double,
      alpha: Double = 1.0): DataFrame = {
    val toksed = Par.spread(df.select(col(idCol).as("doc_id"),
      tokens(lower(col(textCol))).as("toks")))
    // bigram MULTISET (one row per adjacent-pair occurrence — LM counts
    // occurrences, unlike the dedup shingle relations' distinct sets)
    val bi = toksed.select(col("doc_id"), explode(shingles(col("toks"), 2)).as("gram"))
    val biCnt = bi.groupBy(col("gram")).agg(count(lit(1)).as("cb"))
    val uni = toksed.select(explode(col("toks")).as("w"))
    val uniCnt = uni.groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val vocab = uni.select(countDistinct(col("w")).as("vsz"))
    pplCore(df, textCol, idCol, biCnt, uniCnt, vocab, headPpl, tailPpl, alpha)
  }

  /** Persist the bigram LM ([[bigramPerplexity]]'s count relations) as
    * exact-integer parquet: bigram counts, unigram counts, and the 1-row
    * vocab size — the CCNet deployment shape (the LM trains ONCE on the
    * reference corpus; every crawl batch scores against the store without
    * the reference corpus ever being rescanned). The signature-store /
    * BM25-index / quantizer-store discipline applied to the LM. */
  def writeLmCounts(df: DataFrame, textCol: String, dir: String): Unit = {
    // three write actions share ONE tokenization pass (the
    // writeBackoffCounts persistence discipline)
    val toksed = Par.spread(df.select(tokens(lower(col(textCol))).as("toks")))
      .persist()
    try {
      toksed.select(explode(shingles(col("toks"), 2)).as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("cb"))
        .write.mode("overwrite").parquet(s"$dir/bigrams")
      val uni = toksed.select(explode(col("toks")).as("w"))
      uni.groupBy(col("w")).agg(count(lit(1)).as("cu"))
        .write.mode("overwrite").parquet(s"$dir/unigrams")
      uni.select(countDistinct(col("w")).as("vsz"))
        .write.mode("overwrite").parquet(s"$dir/stats")
    } finally { toksed.unpersist(); () }
  }

  /** Score a batch against a PERSISTED LM ([[writeLmCounts]] output):
    * identical arithmetic to the in-job [[bigramPerplexity]] — counts are
    * exact integers either way, so scoring the training corpus itself
    * reproduces the in-job result bit-for-bit (the registered query
    * shares q_x27's oracle verbatim; output equality is the proof). Grams
    * and heads the store has never seen score with their smoothing floor
    * (count 0), exactly what add-α smoothing is for — rows are never
    * dropped. */
  def bigramPerplexityFromLm(spark: org.apache.spark.sql.SparkSession,
      dir: String, df: DataFrame, textCol: String, idCol: String,
      headPpl: Double, tailPpl: Double, alpha: Double = 1.0): DataFrame =
    pplCore(df, textCol, idCol,
      spark.read.parquet(s"$dir/bigrams"),
      spark.read.parquet(s"$dir/unigrams"),
      spark.read.parquet(s"$dir/stats"),
      headPpl, tailPpl, alpha)

  /** HTML → text extraction (the crawl-corpus first transform —
    * trafilatura/jusText-lite, as a deterministic regex chain): drop
    * script/style blocks and comments wholesale, strip the remaining
    * tags to spaces, decode NUMERIC character references
    * (`&#NNN;` / `&#xHH;`, BMP-bounded — see [[decodeNumericEntities]]),
    * decode the six named entities that dominate web text
    * (`&nbsp; &lt; &gt; &quot; &#39;` and `&amp;` LAST, so
    * double-encoded text decodes one level per pass instead of
    * cascading — `&amp;#8220;` becomes the literal `&#8220;`, not `“`,
    * because the numeric pass runs FIRST and never re-runs), collapse
    * whitespace. Every rule is one `regexp_replace`/`replace`/
    * split-transform in RE2-compatible syntax (inline `(?is)` flags,
    * non-greedy blocks, NO backreferences), so a DuckDB oracle replays
    * the chain verbatim. Map-only, codegen'd; null in → null out. This
    * deliberately extracts ALL text (boilerplate included) —
    * main-content selection is the downstream
    * [[c4Rules]]/[[boilerplateScrub]] line-level pass; losing nav text
    * here would hide it from those gates. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(decodeNumericEntities(noTags)) {
        case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Numeric HTML character references — `&#8220;` and `&#x201C;` are
    * ubiquitous in crawl text (smart quotes, dashes, ellipses) where the
    * named-entity table never reaches. Relational decode with no UDF:
    * split on the literal `&#`, and every subsequent part either starts
    * with `digits;` / `[xX]hex;` (decode the code point, keep the tail)
    * or gets its `&#` restored verbatim — so malformed references pass
    * through untouched. BOUNDED code points only: the Basic Multilingual
    * Plane (9, 10, 13, or 32..0xFFFF excluding the D800..DFFF surrogate
    * gap) decodes via a 2-byte UTF-16BE round-trip (Spark's `chr` is
    * ASCII-mod-256, useless here); astral-plane and control references
    * stay literal text — a bounded, documented refusal rather than a
    * wrong char. ONE level, never cascaded: the output string is not
    * rescanned. DuckDB replays with `string_split` + `list_transform` +
    * `chr`. */
  def decodeNumericEntities(s: Column): Column = {
    // decodable BMP code point -> its character; anything else -> null
    def chrBmp(cp: Column): Column = when(
      cp.between(32L, 55295L) || cp.between(57344L, 65535L) ||
        cp.isin(9L, 10L, 13L),
      decode(unhex(lpad(hex(cp), 4, "0")), "UTF-16BE"))
    def decodePart(x: Column): Column = {
      val decCp = regexp_extract(x, "^([0-9]{1,7});", 1).cast("long")
      val hexCp = conv(regexp_extract(x, "^[xX]([0-9a-fA-F]{1,6});", 1),
        16, 10).cast("long")
      when(x.rlike("^[0-9]{1,7};"),
        concat(coalesce(chrBmp(decCp),
            concat(lit("&#"), regexp_extract(x, "^([0-9]{1,7};)", 1))),
          regexp_replace(x, "^[0-9]{1,7};", "")))
        .when(x.rlike("^[xX][0-9a-fA-F]{1,6};"),
          concat(coalesce(chrBmp(hexCp),
              concat(lit("&#"),
                regexp_extract(x, "^([xX][0-9a-fA-F]{1,6};)", 1))),
            regexp_replace(x, "^[xX][0-9a-fA-F]{1,6};", "")))
        .otherwise(concat(lit("&#"), x))
    }
    val parts = split(s, "&#")
    concat(element_at(parts, 1),
      array_join(transform(slice(parts, lit(2), size(parts)),
        x => decodePart(x)), ""))
  }

  /** Main-content extraction (jusText/trafilatura-style BLOCK gating) —
    * the crawl-chain stage [[stripHtml]] deliberately leaves to a
    * downstream pass: real pipelines don't gate pages, they gate
    * BLOCKS. The page splits on block-level tags (p/div/headings/list/
    * table/nav/header/footer/aside/...), each block's text extracts
    * through the [[stripHtml]] chain (script/style/comment drop, tag
    * strip, entity decode, whitespace collapse), and three map-only
    * per-block gates decide survival — the [[gopherRules]] shape one
    * level down:
    *
    *   - length: ≥ `minWords` words (navigation crumbs and headings
    *     are short);
    *   - link density: anchor-text chars / block chars ≤ `maxLinkPpm`
    *     (half-up ppm; a nav bar is nearly ALL anchor text — the
    *     jusText signal);
    *   - stopword density: stopword tokens / tokens ≥ `minStopPpm`
    *     (function words mark running prose; link farms and code have
    *     few — the other jusText signal; 0 disables).
    *
    * Anchor text is the tag-stripped concatenation of `<a>…</a>`
    * inner HTML (single-space-joined, the documented contract).
    * Zero-text blocks (pure markup, scripts) are structural noise and
    * never counted. `main_text` is the kept blocks' text joined by
    * newlines in DOCUMENT ORDER; docs whose every block fails — or
    * with null html — surface with `n_blocks`/`n_kept` 0 and empty
    * text (the observability stance: a page reduced to nothing is a
    * signal, not a dropped row). Map-only per block + one doc-keyed
    * aggregation — no window, no UDF, the 100 TB crawl shape. Returns
    * `(doc_id, n_blocks, n_kept, n_words_kept, main_text)`. */
  def mainContent(df: DataFrame, htmlCol: String, idCol: String,
      minWords: Int = 5, maxLinkPpm: Long = 400000L,
      minStopPpm: Long = 0L): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    val blockSplit = "(?i)</?(?:p|div|h[1-6]|ul|ol|li|table|thead|tbody|" +
      "tr|td|th|section|article|header|footer|nav|aside|blockquote|br|" +
      "hr|form|main)(?:\\s[^>]*)?>"
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val blocks = df.filter(col(htmlCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(htmlCol), blockSplit)))
      .select(col("doc_id"), col("pos").as("block_idx"),
        stripHtml(col("col")).as("btext"),
        stripHtml(concat_ws(" ", regexp_extract_all(col("col"),
          lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)))).as("atext"))
      .filter(length(col("btext")) > 0)
    val scored = blocks
      .withColumn("toks", tokens(lower(col("btext"))))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("la", length(col("atext")).cast("long"))
      .withColumn("lb", length(col("btext")).cast("long"))
      .withColumn("link_ppm",
        expr("(2 * la * 1000000 + lb) div (2 * lb)"))
      .withColumn("n_stop", size(filter(col("toks"),
        w => w.isInCollection(stops))).cast("long"))
      .withColumn("stop_ppm", when(col("n_words") > 0,
        expr("(2 * n_stop * 1000000 + n_words) div (2 * n_words)"))
        .otherwise(lit(0L)))
      .withColumn("kept",
        col("n_words") >= minWords && col("link_ppm") <= maxLinkPpm &&
          col("stop_ppm") >= minStopPpm)
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_words")).otherwise(0L))
          .as("n_words_kept"),
        array_join(transform(array_sort(collect_list(
            when(col("kept"), struct(col("block_idx"), col("btext"))))),
          s => s.getField("btext")), "\n").as("main_text"))
    df.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_words_kept"), lit(0L)).as("n_words_kept"),
        coalesce(col("main_text"), lit("")).as("main_text"))
  }

  /** Min-K% Prob membership gate (Shi et al. 2023, "Detecting
    * Pretraining Data from Large Language Models"): score a document by
    * the MEAN of its k% lowest token log-probs under a reference LM —
    * a member of the training data has few surprisingly-improbable
    * tokens, so even its worst-k% tail scores high; a non-member's tail
    * collapses. The published recipe's model is a neural LM; this
    * engine's reference model is the persisted add-α bigram store
    * ([[writeLmCounts]] — the same store the perplexity gate scores
    * against), which keeps the whole signal exact-integer + single-IEEE
    * and therefore relationally replayable. The curation use is
    * eval-set leakage AUDIT: rank a held-out benchmark by membership
    * score against the training store to find suspected contamination
    * that exact/near-dup matching missed.
    *
    * Per doc: bigram log-probs as 6-dp DECIMAL (the [[pplCore]] lp),
    * sorted ascending IN ROW (the per-doc array is doc-length-bounded —
    * the coverage-union discipline, no window), the lowest
    * `max(1, floor(n·kPct/100))` summed exactly and averaged. At
    * kPct=100 the score is exactly −avg_nll of the perplexity gate
    * (spec-pinned). Unseen grams take the smoothing floor, docs with
    * <2 tokens have no signal: score null, member null — undefined is
    * an answer, not a drop. Returns
    * `(doc_id, n_bigrams, mink_avg_lp, member)`. */
  def minKProbFromLm(spark: org.apache.spark.sql.SparkSession, dir: String,
      df: DataFrame, textCol: String, idCol: String, kPct: Int,
      tau: Double, alpha: Double = 1.0): DataFrame = {
    require(kPct >= 1 && kPct <= 100, s"need 1 <= kPct <= 100, got $kPct")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val biCnt = spark.read.parquet(s"$dir/bigrams")
    val uniCnt = spark.read.parquet(s"$dir/unigrams")
    val vocab = spark.read.parquet(s"$dir/stats")
    val toksed = Par.spread(df.select(col(idCol).as("doc_id"),
      tokens(lower(col(textCol))).as("toks")))
    val bi = toksed.select(col("doc_id"),
      explode(shingles(col("toks"), 2)).as("gram"))
    val m = greatest(lit(1),
      floor(size(col("lps")) * lit(kPct) / lit(100))).cast("int")
    val perDoc = bi
      .join(biCnt, Seq("gram"), "left")
      .withColumn("w1", split(col("gram"), " ").getItem(0))
      .join(uniCnt.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        round(log((coalesce(col("cb"), lit(0L)) + lit(alpha)) /
          (coalesce(col("cu"), lit(0L)) + lit(alpha) * col("vsz"))), 6)
          .cast("decimal(18,6)").as("lp"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("lp"))).as("lps"))
      // same exact-micros rounding as pplCore's avg_nll (the score is
      // negative, so round-half-up acts on the positive magnitude and
      // negates — BigDecimal HALF_UP away-from-zero semantics, tie-safe)
      .withColumn("__m", m.cast("long"))
      .withColumn("__sp", (aggregate(slice(col("lps"), lit(1), m),
        lit(0).cast("decimal(28,6)"),
        (acc, x) => (acc + x).cast("decimal(28,6)")) * lit(-1000000L))
        .cast("long"))
      .select(col("doc_id"), size(col("lps")).cast("long").as("n_bigrams"),
        (-expr("(2 * __sp + __m) div (2 * __m)").cast("double")
          / lit(1000000.0)).as("mink_avg_lp"))
    df.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("mink_avg_lp"),
        (col("mink_avg_lp") >= lit(tau)).as("member"))
  }

  /** Shared scoring core: add-α bigram NLL per doc against the given
    * count relations, bucketed. Left joins + count-0 coalesce make
    * unseen grams/heads take the smoothing floor — a no-op when scoring
    * the corpus the counts came from (every gram matches). */
  private def pplCore(target: DataFrame, textCol: String, idCol: String,
      biCnt: DataFrame, uniCnt: DataFrame, vocab: DataFrame,
      headPpl: Double, tailPpl: Double, alpha: Double): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(headPpl < tailPpl,
      s"need headPpl < tailPpl, got $headPpl >= $tailPpl")
    val toksed = Par.spread(target.select(col(idCol).as("doc_id"),
      tokens(lower(col(textCol))).as("toks")))
    val bi = toksed.select(col("doc_id"), explode(shingles(col("toks"), 2)).as("gram"))
    val perDoc = bi
      .join(biCnt, Seq("gram"), "left")
      .withColumn("w1", split(col("gram"), " ").getItem(0))
      .join(uniCnt.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        round(log((coalesce(col("cb"), lit(0L)) + lit(alpha)) /
          (coalesce(col("cu"), lit(0L)) + lit(alpha) * col("vsz"))), 6)
          .cast("decimal(18,6)").as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("s"))
      // avg_nll to 6 dp in EXACT integer micros: −Σlp is a positive
      // integral number of micros (each lp carries 6 dp), and
      // round-half-up(a/n) = (2a+n) div (2n) for a ≥ 0 — all long
      // arithmetic, so Spark and any SQL oracle agree even when the
      // true quotient sits exactly on a half-micro tie (a double
      // ROUND(x, 6) falls on different sides per engine there; one
      // such tie exists in the sf0.001 CCNet composition)
      .withColumn("__sm", (col("s") * lit(-1000000L)).cast("long"))
      .select(col("doc_id"), col("n_bigrams"),
        (expr("(2 * __sm + n_bigrams) div (2 * n_bigrams)").cast("double")
          / lit(1000000.0)).as("avg_nll"))
    target.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_nll"),
        round(exp(col("avg_nll")), 4).as("ppl"))
      .withColumn("bucket",
        when(col("ppl").isNull, lit("empty"))
          .when(col("ppl") <= headPpl, lit("head"))
          .when(col("ppl") >= tailPpl, lit("tail"))
          .otherwise(lit("middle")))
  }

  /** Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the Chen &
    * Goodman 1999 interpolated form — the KenLM default and the
    * third member of the LM family next to add-α ([[bigramPerplexity]])
    * and stupid backoff ([[stupidBackoff]])): absolute discounting plus
    * a CONTINUATION-count unigram ("how many contexts has w followed"
    * — the insight that makes 'Francisco' unlikely outside 'San'):
    *
    *   p(w|v) = max(c(vw) − D, 0)/c(v·) + D·N1+(v·)/c(v·) · N1+(·w)/B
    *
    * with `D = n1/(n1 + 2·n2)` (the Ney–Essen–Kneser leave-one-out
    * estimate from the counts-of-counts), `N1+` the distinct-
    * continuation counts, and `B` the distinct-bigram total. EVERY
    * ingredient is an integer count, so the probability is formed as
    * ONE exact rational — cross-multiplied numerator/denominator in
    * DECIMAL(38,0):
    *
    *   num = max(c·b − n1, 0)·B + n1·N1+(v·)·N1+(·w),  den = b·c(v·)·B
    *
    * (b = n1 + 2·n2, floored at 1 — n1 = 0 makes D = 0 and the model
    * degenerate exactly to MLE) — and only THEN hits libm once as
    * `round(ln(num/den), 6)` per bigram (the [[bigramPerplexity]]
    * contract: the 6-dp round absorbs ≤1-ulp ln differences, the
    * micro sums stay exact). Pinned conventions: an unseen CONTEXT
    * backs off to the continuation unigram alone (`num = N1+(·w)`,
    * `den = B`); `num = 0` — a word never seen as a continuation —
    * is OOV: lp null, counted in `n_oov`, excluded from the average
    * (the [[stupidBackoff]] convention). Magnitude bound: den =
    * b·c(v)·B must fit DECIMAL(38,0) — comfortable through ~1e12-count
    * corpora (1e36 < 1e38); shard the LM beyond that.
    *
    * Scale shape: training (over `train`) is two hash aggregations on
    * the distinct-bigram relation + two 1-row broadcasts
    * (counts-of-counts, B); scoring (over `target` — pass the train
    * corpus itself for in-sample ppl, a held-out batch for the CCNet
    * gate) is three keyed joins against count relations (AQE broadcasts
    * them while they fit) and one per-doc reduction — the [[pplCore]]
    * shape with one extra keyed join. Returns
    * `(doc_id, n_bigrams, n_oov, avg_nll)` with the exact-micro
    * half-up average over scored bigrams. */
  def knBigramNll(train: DataFrame, target: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val biCnt = knBigramCounts(train, textCol, idCol)
    knScoreCore(target, textCol, idCol, biCnt,
      knContext(biCnt), knContinuation(biCnt), knDiscount(biCnt))
  }

  /** The KN training relations, factored for the in-job path and the
    * persisted store ([[writeKnCounts]]). */
  private def knBigramCounts(train: DataFrame, textCol: String,
      idCol: String): DataFrame =
    Par.spread(train.select(col(idCol).as("doc_id"),
        tokens(lower(col(textCol))).as("toks")))
      .select(col("doc_id"), explode(shingles(col("toks"), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cb"))
      .withColumn("v", split(col("gram"), " ").getItem(0))
      .withColumn("w", split(col("gram"), " ").getItem(1))
  private def knContext(biCnt: DataFrame): DataFrame =
    biCnt.groupBy(col("v"))
      .agg(sum(col("cb")).as("cv"), count(lit(1)).as("nv"))
  private def knContinuation(biCnt: DataFrame): DataFrame =
    biCnt.groupBy(col("w")).agg(count(lit(1)).as("nw"))
  private def knDiscount(biCnt: DataFrame): DataFrame =
    biCnt.agg(
      sum(when(col("cb") === 1, 1L).otherwise(0L)).as("n1"),
      greatest(sum(when(col("cb") === 1, 1L).otherwise(0L)) +
        lit(2L) * sum(when(col("cb") === 2, 1L).otherwise(0L)), lit(1L))
        .as("b"),
      count(lit(1)).as("bt"))

  /** Persist the KN model as exact-integer parquet — the
    * [[writeLmCounts]] discipline applied to the Kneser-Ney relations
    * (bigram counts, context totals, continuation counts, the 1-row
    * discount stats): train ONCE on the reference corpus, score every
    * batch against the store without the reference ever rescanning.
    * All four relations derive from one bigram-count aggregation. */
  def writeKnCounts(train: DataFrame, textCol: String, dir: String,
      idCol: String = "doc_id"): Unit = {
    knBigramCounts(train, textCol, idCol)
      .write.mode("overwrite").parquet(s"$dir/bigrams")
    val bc = train.sparkSession.read.parquet(s"$dir/bigrams")
    knContext(bc).write.mode("overwrite").parquet(s"$dir/contexts")
    knContinuation(bc).write.mode("overwrite").parquet(s"$dir/continuations")
    knDiscount(bc).write.mode("overwrite").parquet(s"$dir/disc")
  }

  /** Opt-out purge of a persisted add-α LM store ([[writeLmCounts]]) —
    * the COUNT-store member of the purge family (signatures/blooms/
    * postings purge by row deletion; an aggregate store purges by
    * SUBTRACTION, which exact integer counts make lossless): the
    * purge request carries the revoked TEXTS (the purgeSignatures
    * contract — a count store holds no doc ids to filter by), their
    * bigram/unigram contributions subtract, zero-count rows drop, and
    * the vocab stat recomputes from the post-purge unigrams. An
    * in-plan raise fires if any count would go NEGATIVE — the request
    * claims more occurrences than the store holds (a double purge, a
    * doc never absorbed), and silently clamping would leave the model
    * quietly wrong. (The guard's reach is exact arithmetic's: a claim
    * whose grams have ALREADY vanished subtracts nothing and cannot be
    * distinguished from a legitimate no-op — the tombstone trail is
    * the audit for that.) Tombstones (text
    * md5s) append first. After the purge the store scores
    * byte-identically to one trained on the survivors (spec-proved
    * frame equality through the scoring path). */
  def purgeLmCounts(spark: org.apache.spark.sql.SparkSession, dir: String,
      purged: DataFrame, textCol: String = "text"): Unit = {
    purged.select(md5(col(textCol)).as("h"))
      .write.mode("append").parquet(s"$dir/tombstones")
    val toksed = Par.spread(purged.filter(col(textCol).isNotNull)
      .select(tokens(lower(col(textCol))).as("toks")))
    val pb = toksed.select(explode(shingles(col("toks"), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("__pc"))
      .localCheckpoint(true)
    val pu = toksed.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("__pc"))
      .localCheckpoint(true)
    def subtract(rel: String, keyCol: String, cntCol: String,
        p: DataFrame): Unit =
      graft.sources.Sinks.rewriteParquet(spark, s"$dir/$rel", df =>
        df.join(broadcast(p), Seq(keyCol), "left")
          .select(col(keyCol),
            (col(cntCol) - coalesce(col("__pc"), lit(0L))).as(cntCol))
          .withColumn(cntCol, when(col(cntCol) < 0, raise_error(concat(
              lit(s"purgeLmCounts: $rel count for '"), col(keyCol),
              lit("' would go negative — the purge request claims a " +
                "doc this store never absorbed"))))
            .otherwise(col(cntCol)))
          .filter(col(cntCol) > 0))
    subtract("bigrams", "gram", "cb", pb)
    subtract("unigrams", "w", "cu", pu)
    val vsz = spark.read.parquet(s"$dir/unigrams").count()
    graft.sources.Sinks.rewriteParquet(spark, s"$dir/stats",
      _.select(lit(vsz).as("vsz")))
  }

  /** Opt-out purge of a persisted KN model ([[writeKnCounts]]): the
    * revoked texts' bigram contributions SUBTRACT from the base count
    * relation ([[purgeLmCounts]]'s lossless-integer argument, same
    * negative-count raise, same text-md5 tombstones), and the three
    * DERIVED relations (contexts, continuations, discount stats)
    * rebuild from the post-purge bigrams — they are pure functions of
    * it, so the purged store is exactly the survivor-trained store. */
  def purgeKnCounts(spark: org.apache.spark.sql.SparkSession, dir: String,
      purged: DataFrame, textCol: String = "text"): Unit = {
    purged.select(md5(col(textCol)).as("h"))
      .write.mode("append").parquet(s"$dir/tombstones")
    val pb = Par.spread(purged.filter(col(textCol).isNotNull)
        .select(tokens(lower(col(textCol))).as("toks")))
      .select(explode(shingles(col("toks"), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("__pc"))
      .localCheckpoint(true)
    graft.sources.Sinks.rewriteParquet(spark, s"$dir/bigrams", df =>
      df.join(broadcast(pb), Seq("gram"), "left")
        .select(col("gram"),
          (col("cb") - coalesce(col("__pc"), lit(0L))).as("cb"),
          col("v"), col("w"))
        .withColumn("cb", when(col("cb") < 0, raise_error(concat(
            lit("purgeKnCounts: bigram count for '"), col("gram"),
            lit("' would go negative — the purge request claims a doc " +
              "this store never absorbed"))))
          .otherwise(col("cb")))
        .filter(col("cb") > 0))
    val bc = spark.read.parquet(s"$dir/bigrams")
    graft.sources.Sinks.rewriteParquet(spark, s"$dir/contexts",
      _ => knContext(bc))
    graft.sources.Sinks.rewriteParquet(spark, s"$dir/continuations",
      _ => knContinuation(bc))
    graft.sources.Sinks.rewriteParquet(spark, s"$dir/disc",
      _ => knDiscount(bc))
  }

  /** Score a batch against a PERSISTED KN model ([[writeKnCounts]]
    * output): identical arithmetic to the in-job [[knBigramNll]] —
    * every relation is exact integers either way, so the registered
    * query shares q_x75's oracle VERBATIM (output equality is the
    * equivalence proof, the bigramPerplexityFromLm discipline). */
  def knBigramNllFromStore(spark: org.apache.spark.sql.SparkSession,
      dir: String, target: DataFrame, textCol: String,
      idCol: String): DataFrame =
    knScoreCore(target, textCol, idCol,
      spark.read.parquet(s"$dir/bigrams"),
      spark.read.parquet(s"$dir/contexts"),
      spark.read.parquet(s"$dir/continuations"),
      spark.read.parquet(s"$dir/disc"))

  /** Shared KN scoring tail (exact-rational probability + one 6-dp ln
    * per bigram + exact-micro per-doc average). */
  private def knScoreCore(target: DataFrame, textCol: String,
      idCol: String, biCnt: DataFrame, ctx: DataFrame, cont: DataFrame,
      disc: DataFrame): DataFrame = {
    val bi = Par.spread(target.select(col(idCol).as("doc_id"),
        tokens(lower(col(textCol))).as("toks")))
      .select(col("doc_id"), explode(shingles(col("toks"), 2)).as("gram"))
    val scored = bi
      .join(biCnt.select(col("gram"), col("cb")), Seq("gram"), "left")
      .withColumn("v", split(col("gram"), " ").getItem(0))
      .withColumn("w", split(col("gram"), " ").getItem(1))
      .join(ctx, Seq("v"), "left")
      .join(cont, Seq("w"), "left")
      .crossJoin(broadcast(disc))
      .withColumn("__num", when(col("cv").isNotNull, expr(
          "greatest(CAST(coalesce(cb, 0) AS DECIMAL(38,0)) * b - n1, 0) " +
            "* bt + CAST(n1 AS DECIMAL(38,0)) * nv * coalesce(nw, 0)"))
        .otherwise(expr("CAST(coalesce(nw, 0) AS DECIMAL(38,0))")))
      .withColumn("__den", when(col("cv").isNotNull,
          expr("CAST(b AS DECIMAL(38,0)) * cv * bt"))
        .otherwise(expr("CAST(bt AS DECIMAL(38,0))")))
      // Overflow guard (the passAtK maxN discipline): every input to
      // __num/__den is non-null by construction (cv-branch inputs ride
      // the same joined row; the backoff branch coalesces), so a null
      // can ONLY be a DECIMAL(38,0) overflow under non-ANSI arithmetic
      // — past the documented ~1e12-count bound b·cv·bt no longer fits
      // — and silently treating it as OOV would miscount the bigram.
      // Raise instead. (Under ANSI, the default here, the multiply
      // itself throws NUMERIC_VALUE_OUT_OF_RANGE at the same bound.)
      .withColumn("__num", when(col("__num").isNull || col("__den").isNull,
          raise_error(concat(lit("knScoreCore: exact-rational product " +
            "for bigram '"), col("gram"), lit("' overflowed " +
            "DECIMAL(38,0) — corpus counts exceed the ~1e12 bound; " +
            "shard the corpus before scoring"))))
        .otherwise(col("__num")))
      .select(col("doc_id"),
        when(col("__num") > 0,
          round(log(col("__num").cast("double") /
            col("__den").cast("double")), 6).cast("decimal(18,6)"))
          .as("lp"))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("lp").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("lp")).as("__s"),
        sum(when(col("lp").isNotNull, 1L).otherwise(0L)).as("__n"))
      .withColumn("__sm", (col("__s") * lit(-1000000L)).cast("long"))
      .select(col("doc_id"), col("n_bigrams"), col("n_oov"),
        when(col("__n") > 0,
          expr("(2 * __sm + __n) div (2 * __n)").cast("double")
            / lit(1000000.0)).as("avg_nll"))
    target.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        col("avg_nll"))
  }

  /** Interpolated Kneser-Ney TRIGRAM LM — [[knBigramNll]]'s recursion
    * extended one backoff rung, exactly as KenLM chains orders:
    *
    *   p(w|u,v) = max(c(uvw) − D₃, 0)/c(uv·)
    *            + D₃·N1+(uv·)/c(uv·) · p_mid(w|v)
    *
    * where the MIDDLE rung is the bigram formula over CONTINUATION
    * (type) counts — `cc(v,w) = N1+(·vw)`, the count of distinct
    * left-contexts of the bigram, NOT its token count (the Kneser-Ney
    * insight applied at every lower order):
    *
    *   p_mid(w|v) = max(cc(vw) − D₂, 0)/N1+(·v·)
    *              + D₂·N1+(v·*)/N1+(·v·) · N1+(·w)/B
    *
    * Each rung's discount is its own Ney–Essen–Kneser estimate
    * (`D₃ = n1₃/b₃` from trigram counts-of-counts, `D₂ = n1₂/b₂` from
    * the continuation counts-of-counts; b floored at 1). The whole
    * probability forms as ONE exact rational: with
    * `num_mid = max(cc·b₂ − n1₂, 0)·B + n1₂·N1+(v·*)·N1+(·w)` and
    * `den_mid = b₂·N1+(·v·)·B`,
    *
    *   num = max(c₃·b₃ − n1₃, 0)·den_mid + n1₃·N1+(uv·)·num_mid
    *   den = b₃·c(uv·)·den_mid
    *
    * then libm once as `round(ln(num/den), 6)` per trigram. Pinned
    * conventions (the q_x75 stances, one rung up): an unseen (u,v)
    * CONTEXT backs off to p_mid (num = num_mid, den = den_mid) — a
    * seen (u,v) guarantees v is a seen middle, so the rungs never
    * skip; an unseen MIDDLE v falls to the continuation unigram
    * (num = N1+(·w), den = B); num = 0 is OOV (lp null, counted,
    * excluded from the average). Exactness proof carried by the spec:
    * Σ_w num(w|u,v) = den for every seen context — each rung's
    * interpolation mass telescopes (`Σ max(cc·b−n1,0) = b·cmid −
    * nvm·n1` because every type count ≥ 1), so p(·|u,v) sums to
    * EXACTLY 1 as rationals, not approximately as floats. Magnitude
    * bound: den = b₃·c(uv)·b₂·N1+(·v·)·B is five count factors —
    * DECIMAL(38,0) holds through ~1e7-type corpora per shard; the
    * in-plan overflow raise (the [[knScoreCore]] stance) refuses
    * silently-null products past it.
    *
    * Scale shape: training is three hash aggregations on the
    * distinct-trigram relation (trigram counts → continuation counts →
    * their context/continuation rollups) + a 1-row discount broadcast;
    * scoring is five keyed joins against count relations (AQE
    * broadcasts them while they fit) + one per-doc reduction. Returns
    * `(doc_id, n_trigrams, n_oov, avg_nll)`. */
  def knTrigramNll(train: DataFrame, target: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val tri = kn3Counts(train, textCol, idCol)
    val cc = kn3MidCounts(tri)
    knScore3Core(target, textCol, idCol, tri, kn3Ctx(tri), cc,
      kn3MidCtx(cc), kn3Cont(cc), kn3Disc(tri, cc))
  }

  /** The KN-trigram training relations, factored for the in-job path
    * and the persisted store ([[writeKn3Counts]]). */
  private def kn3Counts(train: DataFrame, textCol: String,
      idCol: String): DataFrame =
    Par.spread(train.select(col(idCol).as("doc_id"),
        tokens(lower(col(textCol))).as("toks")))
      .select(col("doc_id"), explode(shingles(col("toks"), 3)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c3"))
      .withColumn("u", split(col("gram"), " ").getItem(0))
      .withColumn("v", split(col("gram"), " ").getItem(1))
      .withColumn("w", split(col("gram"), " ").getItem(2))
  private def kn3Ctx(tri: DataFrame): DataFrame =
    tri.groupBy(col("u"), col("v"))
      .agg(sum(col("c3")).as("cuv"), count(lit(1)).as("nuv"))
  /** Continuation (type) counts of each bigram as a trigram tail:
    * `cc(v,w) = N1+(·vw)` — one row per (v,w) seen as positions 2–3. */
  private def kn3MidCounts(tri: DataFrame): DataFrame =
    tri.groupBy(col("v"), col("w")).agg(count(lit(1)).as("cc"))
  private def kn3MidCtx(cc: DataFrame): DataFrame =
    cc.groupBy(col("v"))
      .agg(sum(col("cc")).as("cmid"), count(lit(1)).as("nvm"))
  private def kn3Cont(cc: DataFrame): DataFrame =
    cc.groupBy(col("w")).agg(count(lit(1)).as("nw"))
  private def kn3Disc(tri: DataFrame, cc: DataFrame): DataFrame =
    tri.agg(
      sum(when(col("c3") === 1, 1L).otherwise(0L)).as("n1_3"),
      greatest(sum(when(col("c3") === 1, 1L).otherwise(0L)) +
        lit(2L) * sum(when(col("c3") === 2, 1L).otherwise(0L)), lit(1L))
        .as("b3"))
    .crossJoin(cc.agg(
      sum(when(col("cc") === 1, 1L).otherwise(0L)).as("n1_2"),
      greatest(sum(when(col("cc") === 1, 1L).otherwise(0L)) +
        lit(2L) * sum(when(col("cc") === 2, 1L).otherwise(0L)), lit(1L))
        .as("b2"),
      count(lit(1)).as("bt")))

  /** Persist the KN-trigram model as exact-integer parquet — the
    * [[writeKnCounts]] discipline one order up: the trigram counts and
    * their four derived relations (uv contexts, (v,w) continuation
    * counts, v middles, w continuations, 1-row discounts), all pure
    * functions of `dir/trigrams`. */
  def writeKn3Counts(train: DataFrame, textCol: String, dir: String,
      idCol: String = "doc_id"): Unit = {
    kn3Counts(train, textCol, idCol)
      .write.mode("overwrite").parquet(s"$dir/trigrams")
    val tri = train.sparkSession.read.parquet(s"$dir/trigrams")
    kn3Ctx(tri).write.mode("overwrite").parquet(s"$dir/contexts")
    kn3MidCounts(tri).write.mode("overwrite").parquet(s"$dir/midcounts")
    val cc = train.sparkSession.read.parquet(s"$dir/midcounts")
    kn3MidCtx(cc).write.mode("overwrite").parquet(s"$dir/middles")
    kn3Cont(cc).write.mode("overwrite").parquet(s"$dir/continuations")
    kn3Disc(tri, cc).write.mode("overwrite").parquet(s"$dir/disc")
  }

  /** Opt-out purge of a persisted KN-trigram model: the revoked texts'
    * TRIGRAM contributions subtract from the base count relation
    * ([[purgeKnCounts]]'s lossless-integer argument, same
    * negative-count raise, same text-md5 tombstones); every derived
    * relation — including the continuation-count rung — rebuilds from
    * the post-purge trigrams, so the purged store is exactly the
    * survivor-trained store. */
  def purgeKn3Counts(spark: org.apache.spark.sql.SparkSession, dir: String,
      purged: DataFrame, textCol: String = "text"): Unit = {
    purged.select(md5(col(textCol)).as("h"))
      .write.mode("append").parquet(s"$dir/tombstones")
    val pt = Par.spread(purged.filter(col(textCol).isNotNull)
        .select(tokens(lower(col(textCol))).as("toks")))
      .select(explode(shingles(col("toks"), 3)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("__pc"))
      .localCheckpoint(true)
    graft.sources.Sinks.rewriteParquet(spark, s"$dir/trigrams", df =>
      df.join(broadcast(pt), Seq("gram"), "left")
        .select(col("gram"),
          (col("c3") - coalesce(col("__pc"), lit(0L))).as("c3"),
          col("u"), col("v"), col("w"))
        .withColumn("c3", when(col("c3") < 0, raise_error(concat(
            lit("purgeKn3Counts: trigram count for '"), col("gram"),
            lit("' would go negative — the purge request claims a doc " +
              "this store never absorbed"))))
          .otherwise(col("c3")))
        .filter(col("c3") > 0))
    val tri = spark.read.parquet(s"$dir/trigrams")
    graft.sources.Sinks.rewriteParquet(spark, s"$dir/contexts",
      _ => kn3Ctx(tri))
    graft.sources.Sinks.rewriteParquet(spark, s"$dir/midcounts",
      _ => kn3MidCounts(tri))
    val cc = spark.read.parquet(s"$dir/midcounts")
    graft.sources.Sinks.rewriteParquet(spark, s"$dir/middles",
      _ => kn3MidCtx(cc))
    graft.sources.Sinks.rewriteParquet(spark, s"$dir/continuations",
      _ => kn3Cont(cc))
    graft.sources.Sinks.rewriteParquet(spark, s"$dir/disc",
      _ => kn3Disc(tri, cc))
  }

  /** Score a batch against a PERSISTED KN-trigram model
    * ([[writeKn3Counts]] output) — identical arithmetic to the in-job
    * [[knTrigramNll]], so the registered store twin shares q_x84's
    * oracle VERBATIM (the q_x79 equivalence-by-output-equality
    * discipline). */
  def knTrigramNllFromStore(spark: org.apache.spark.sql.SparkSession,
      dir: String, target: DataFrame, textCol: String,
      idCol: String): DataFrame =
    knScore3Core(target, textCol, idCol,
      spark.read.parquet(s"$dir/trigrams"),
      spark.read.parquet(s"$dir/contexts"),
      spark.read.parquet(s"$dir/midcounts"),
      spark.read.parquet(s"$dir/middles"),
      spark.read.parquet(s"$dir/continuations"),
      spark.read.parquet(s"$dir/disc"))

  /** Shared KN-trigram scoring tail — the [[knScoreCore]] shape with
    * the two-rung rational. Exposed `private[graft]` at the rational
    * level via [[kn3Rationals]] so the normalization spec can assert
    * Σ_w num = den exactly. */
  private def knScore3Core(target: DataFrame, textCol: String,
      idCol: String, tri: DataFrame, ctx: DataFrame, cc: DataFrame,
      mid: DataFrame, cont: DataFrame, disc: DataFrame): DataFrame = {
    val scored = kn3Rationals(target, textCol, idCol, tri, ctx, cc, mid,
      cont, disc)
      .select(col("doc_id"),
        when(col("__num") > 0,
          round(log(col("__num").cast("double") /
            col("__den").cast("double")), 6).cast("decimal(18,6)"))
          .as("lp"))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("lp").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("lp")).as("__s"),
        sum(when(col("lp").isNotNull, 1L).otherwise(0L)).as("__n"))
      .withColumn("__sm", (col("__s") * lit(-1000000L)).cast("long"))
      .select(col("doc_id"), col("n_trigrams"), col("n_oov"),
        when(col("__n") > 0,
          expr("(2 * __sm + __n) div (2 * __n)").cast("double")
            / lit(1000000.0)).as("avg_nll"))
    target.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        col("avg_nll"))
  }

  /** The per-trigram exact rational `(doc_id, gram, __num, __den)` —
    * the spec's normalization anchor and [[knScore3Core]]'s input. */
  private[graft] def kn3Rationals(target: DataFrame, textCol: String,
      idCol: String, tri: DataFrame, ctx: DataFrame, cc: DataFrame,
      mid: DataFrame, cont: DataFrame, disc: DataFrame): DataFrame = {
    val bi = Par.spread(target.select(col(idCol).as("doc_id"),
        tokens(lower(col(textCol))).as("toks")))
      .select(col("doc_id"), explode(shingles(col("toks"), 3)).as("gram"))
    bi
      .join(tri.select(col("gram"), col("c3")), Seq("gram"), "left")
      .withColumn("u", split(col("gram"), " ").getItem(0))
      .withColumn("v", split(col("gram"), " ").getItem(1))
      .withColumn("w", split(col("gram"), " ").getItem(2))
      .join(ctx, Seq("u", "v"), "left")
      .join(cc, Seq("v", "w"), "left")
      .join(mid, Seq("v"), "left")
      .join(cont, Seq("w"), "left")
      .crossJoin(broadcast(disc))
      // the middle rung's rational, shared by both upper branches
      .withColumn("__num_mid", expr(
        "greatest(CAST(coalesce(cc, 0) AS DECIMAL(38,0)) * b2 - n1_2, 0) " +
          "* bt + CAST(n1_2 AS DECIMAL(38,0)) * nvm * coalesce(nw, 0)"))
      .withColumn("__den_mid", expr("CAST(b2 AS DECIMAL(38,0)) * cmid * bt"))
      .withColumn("__num",
        when(col("cuv").isNotNull, expr(
          "greatest(CAST(coalesce(c3, 0) AS DECIMAL(38,0)) * b3 - n1_3, 0) " +
            "* __den_mid + CAST(n1_3 AS DECIMAL(38,0)) * nuv * __num_mid"))
        .when(col("cmid").isNotNull, col("__num_mid"))
        .otherwise(expr("CAST(coalesce(nw, 0) AS DECIMAL(38,0))")))
      .withColumn("__den",
        when(col("cuv").isNotNull,
          expr("CAST(b3 AS DECIMAL(38,0)) * cuv * __den_mid"))
        .when(col("cmid").isNotNull, col("__den_mid"))
        .otherwise(expr("CAST(bt AS DECIMAL(38,0))")))
      // overflow guard — the knScoreCore stance: every input is non-null
      // by construction inside its branch, so a null product can only be
      // a DECIMAL(38,0) overflow under non-ANSI arithmetic
      .withColumn("__num", when(col("__num").isNull || col("__den").isNull,
          raise_error(concat(lit("knScore3Core: exact-rational product " +
            "for trigram '"), col("gram"), lit("' overflowed " +
            "DECIMAL(38,0) — five count factors exceed the ~1e7-type " +
            "bound; shard the corpus before scoring"))))
        .otherwise(col("__num")))
      .select(col("doc_id"), col("gram"), col("__num"), col("__den"))
  }

  /** Trigram scoring with STUPID BACKOFF (Brants et al. 2007, "Large
    * Language Models in Machine Translation") — the large-corpus LM
    * shape beyond the bigram gate: no discounting, no normalization,
    * just relative frequencies with a fixed 0.4 factor per back-off
    * level:
    *
    *   S(w3|w1 w2) = C(w1w2w3)/C(w1w2)        trigram seen in train
    *               = 0.4 · C(w2w3)/C(w2)      else, bigram seen
    *               = 0.4 · 0.4 · C(w3)/N      else, w3 seen
    *               = null (OOV)               w3 never seen
    *
    * Trains counts on `train` and scores `target` — the two-corpus
    * shape (reference → new batch) is what makes the back-off branches
    * real; self-scoring never leaves the first branch. Emits per-doc
    * trigram/OOV counts, the average negative log-score, its exp (a
    * perplexity-like magnitude), and a head/middle/tail bucket; docs
    * under 3 tokens bucket 'empty', docs whose every trigram is OOV
    * bucket 'oov'.
    *
    * Determinism: counts exact; each trigram's ln rounds to 6 dp and
    * sums as DECIMAL (the [[bigramPerplexity]] contract); score
    * branches are single IEEE op chains mirrored by the oracle. Scale:
    * three training hash aggregations (distinct-gram-sized shuffles);
    * scoring is keyed left joins (AQE broadcasts the count relations
    * while they fit) + one per-doc reduce. */
  def stupidBackoff(train: DataFrame, target: DataFrame,
      textCol: String, idCol: String,
      headS: Double, tailS: Double): DataFrame = {
    val trToks = Par.spread(train.select(tokens(lower(col(textCol))).as("toks")))
    val tri = trToks.select(explode(shingles(col("toks"), 3)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c3"))
    val big = trToks.select(explode(shingles(col("toks"), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c2"))
    val uni = trToks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val tot = trToks.agg(coalesce(sum(size(col("toks"))), lit(0L)).as("nn"))
    stupidBackoffFrom(tri, big, uni, tot, target, textCol, idCol, headS, tailS)
  }

  /** Persist [[stupidBackoff]]'s trigram/bigram/unigram count relations
    * + the 1-row token total as exact-integer parquet — the
    * [[writeLmCounts]] discipline one order up: the reference corpus
    * trains ONCE, every crawl batch scores against the store without
    * the reference ever being rescanned. */
  def writeBackoffCounts(train: DataFrame, textCol: String,
      dir: String): Unit = {
    // four write actions share ONE tokenization pass: the projection is
    // persisted (memory-and-disk, so oversized references spill rather
    // than re-scan) for the duration of the store build
    val trToks = Par.spread(train.select(tokens(lower(col(textCol))).as("toks")))
      .persist()
    try {
      trToks.select(explode(shingles(col("toks"), 3)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c3"))
        .write.mode("overwrite").parquet(s"$dir/trigrams")
      trToks.select(explode(shingles(col("toks"), 2)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c2"))
        .write.mode("overwrite").parquet(s"$dir/bigrams")
      trToks.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1"))
        .write.mode("overwrite").parquet(s"$dir/unigrams")
      trToks.agg(coalesce(sum(size(col("toks"))), lit(0L)).as("nn"))
        .write.mode("overwrite").parquet(s"$dir/total")
    } finally { trToks.unpersist(); () }
  }

  /** [[stupidBackoff]] scored against a PERSISTED count store
    * ([[writeBackoffCounts]] output): byte-identical scoring (q_x53
    * shares q_x52's oracle verbatim on the same split) with the
    * reference corpus never rescanned — only the target batch is
    * tokenized; the counts arrive as narrow parquet reads. */
  def stupidBackoffFromStore(target: DataFrame, dir: String,
      textCol: String, idCol: String,
      headS: Double, tailS: Double): DataFrame = {
    val spark = target.sparkSession
    stupidBackoffFrom(
      spark.read.parquet(s"$dir/trigrams"),
      spark.read.parquet(s"$dir/bigrams"),
      spark.read.parquet(s"$dir/unigrams"),
      spark.read.parquet(s"$dir/total"),
      target, textCol, idCol, headS, tailS)
  }

  private def stupidBackoffFrom(tri: DataFrame, big: DataFrame,
      uni: DataFrame, tot: DataFrame, target: DataFrame,
      textCol: String, idCol: String,
      headS: Double, tailS: Double): DataFrame = {
    require(headS < tailS, s"need headS < tailS, got $headS >= $tailS")
    val grams = Par.spread(target.select(col(idCol).as("doc_id"),
        tokens(lower(col(textCol))).as("toks")))
      .select(col("doc_id"), explode(shingles(col("toks"), 3)).as("g"))
      .withColumn("__p", split(col("g"), " "))
      .select(col("doc_id"), col("g"),
        concat_ws(" ", col("__p").getItem(0), col("__p").getItem(1)).as("b12"),
        concat_ws(" ", col("__p").getItem(1), col("__p").getItem(2)).as("b23"),
        col("__p").getItem(1).as("w2x"), col("__p").getItem(2).as("w3x"))
    val perDoc = grams
      .join(tri.select(col("g").as("__g3"), col("c3")),
        col("g") === col("__g3"), "left")
      .join(big.select(col("g").as("__b12"), col("c2").as("c12")),
        col("b12") === col("__b12"), "left")
      .join(big.select(col("g").as("__b23"), col("c2").as("c23")),
        col("b23") === col("__b23"), "left")
      .join(uni.select(col("w").as("__w2"), col("c1").as("cw2")),
        col("w2x") === col("__w2"), "left")
      .join(uni.select(col("w").as("__w3"), col("c1").as("cw3")),
        col("w3x") === col("__w3"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        when(col("c3").isNotNull, col("c3").cast("double") / col("c12"))
          .when(col("c23").isNotNull,
            lit(0.4) * (col("c23").cast("double") / col("cw2")))
          .when(col("cw3").isNotNull,
            lit(0.4) * lit(0.4) * (col("cw3").cast("double") / col("nn")))
          .as("sc"))
      .select(col("doc_id"),
        when(col("sc").isNotNull,
          round(log(col("sc")), 6).cast("decimal(18,6)")).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"), count(col("lp")).as("n_scored"),
        sum(col("lp")).as("s"))
      // exact-micros rounding (the pplCore avg_nll discipline): −Σlp is
      // integral micros; round-half-up(a/n) = (2a+n) div (2n), all longs
      .withColumn("__sm", (col("s") * lit(-1000000L)).cast("long"))
      .select(col("doc_id"), col("n_trigrams"),
        (col("n_trigrams") - col("n_scored")).as("n_oov"),
        when(col("n_scored") > 0,
          expr("(2 * __sm + n_scored) div (2 * n_scored)").cast("double")
            / lit(1000000.0)).as("avg_nls"))
    target.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        col("avg_nls"),
        round(exp(col("avg_nls")), 4).as("sbo_ppl"))
      .withColumn("bucket",
        when(col("n_trigrams") === 0, lit("empty"))
          .when(col("sbo_ppl").isNull, lit("oov"))
          .when(col("sbo_ppl") <= headS, lit("head"))
          .when(col("sbo_ppl") >= tailS, lit("tail"))
          .otherwise(lit("middle")))
  }

  /** Compressibility quality signal: DEFLATE length over raw length
    * (codegen'd [[graft.functions.DeflateLen]] kernel). Repetitive /
    * templated / machine-generated text compresses far below natural
    * prose, so pipelines gate on this ratio (low = suspicious). Map-only;
    * engine-specific output (zlib), so rows-only checked like the
    * sketches. */
  def compressionRatio(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.DeflateLen.register(df.sparkSession)
    df.select(col(idCol).as("doc_id"), length(col(textCol)).as("n_chars"),
        call_function("deflate_len", col(textCol)).as("n_deflate"))
      .withColumn("ratio",
        round(col("n_deflate").cast("double") / col("n_chars"), 6))
  }

  /** Collapse runs of consecutively repeated tokens to one occurrence
    * ("the the the cat" → "the cat") — the run-length squeeze that cleans
    * OCR stutter and templated boilerplate. Pure array HOF with an index
    * lambda: O(tokens) per row, map-only, inside whole-stage codegen. */
  def squeezeRuns(toks: Column): Column =
    filter(toks, (t, i) => i === 0 || t =!= element_at(toks, i))

  /** Top-`k` TF-IDF terms per document. tf = in-doc occurrences, df =
    * docs containing the term, idf = ln((N+1)/(df+1)) — the smoothed
    * textbook form. Scale shape: tf and df are keyed hash aggregations
    * (map-side combined), N is a broadcast one-row cross join (never a
    * driver-side count), and the per-doc top-k windows over each doc's
    * DISTINCT terms — a partition-local sort of ~vocabulary-per-doc rows,
    * not the token stream. Deterministic: 6-dp rounding absorbs the
    * ≤1-ulp ln() difference across engines; ties break on the term. */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val px = Par.spread(df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks")))
      .select(col("doc_id"), explode(col("toks")).as("term"))
    val tf = px.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfr, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log((col("n_docs").cast("double") + 1) / (col("df") + 1)), 6)
          .as("tfidf"))
    // ranking rides the bounded top-k buffer (string-id variant): ≤ k
    // (tfidf, term) pairs per doc per map task — the perQueryTopK
    // contract, replacing the doc-partitioned row_number window this
    // used before (bounded-by-vocab but not map-side-combined); tf/df
    // rejoin keyed by (doc, term)
    val ranked = scored.groupBy(col("doc_id"))
      .agg(graft.functions.TopKAggregator.topKStrColumn(k)(
        col("tfidf"), col("term")).as("__top"))
      .select(col("doc_id"), posexplode(col("__top")).as(Seq("__p", "t")))
      .select(col("doc_id"), col("t.sid").as("term"),
        (col("__p") + 1).cast("int").as("rnk"))
    ranked.join(scored, Seq("doc_id", "term"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rnk"))
  }

  /** BM25 keyword retrieval (Robertson & Zaragoza 2009, "The
    * Probabilistic Relevance Framework") — score every document against
    * a small query set and return the top `k` docs per query:
    *
    *   score(q,d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *   idf(t)     = ln((N − df + 0.5)/(df + 0.5) + 1)
    *
    * The retrieval shape of a training-data pipeline's "find documents
    * about X" probes (targeted decontamination, topic audits, eval-set
    * mining). Queries are a driver-side literal list (broadcast), so
    * the corpus-side plan is: one tf hash aggregation, one df hash
    * aggregation, a broadcast join of the query terms onto tf, and the
    * bounded [[graft.functions.TopKAggregator]] ranking — ≤k (score,
    * id) pairs per query per map task, never a per-query reducer sort.
    * Corpus stats (N, avgdl) ride a broadcast 1-row aggregate.
    *
    * Determinism: tf/df/dl are exact integers; idf's ln and the tf
    * normalization each round to 6 dp and multiply as DECIMAL (exact),
    * so the per-(query,doc) sum is order-independent; ties rank by
    * (score desc, doc_id asc). Returns (query_id, doc_id, score, rnk).
    */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
      queries: Seq[(Int, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (tf, stats) = bm25Corpus(df, textCol, idCol)
    bm25Score(tf, stats, queries, k, k1, b)
  }

  /** The two BM25 index relations for a corpus: the postings
    * `(doc_id, dl, term, tf)` and the one-row raw stats
    * `(n_docs, sum_dl)` — exact integers, so the derived avgdl is the
    * same double no matter where the stats are re-read from. */
  private def bm25Corpus(df: DataFrame, textCol: String,
      idCol: String): (DataFrame, DataFrame) = {
    val toksed = Par.spread(df.select(col(idCol).as("doc_id"),
      tokens(lower(col(textCol))).as("toks")))
    val tf = toksed
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
    val stats = toksed.select(count(lit(1)).as("n_docs"),
      sum(size(col("toks"))).as("sum_dl"))
    (tf, stats)
  }

  /** Scoring core shared by [[bm25TopK]] and [[bm25TopKFromIndex]]:
    * takes the postings + raw stats relations, derives df per term with
    * one aggregation over the (narrow) postings, and ranks through the
    * bounded top-k. */
  private def bm25Score(tf: DataFrame, stats: DataFrame,
      queries: Seq[(Int, Seq[String])], k: Int,
      k1: Double, b: Double): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    require(queries.forall(_._2.nonEmpty), "every query needs >= 1 term")
    require(k >= 1, s"k must be >= 1, got $k")
    val sp = tf.sparkSession
    import sp.implicits._
    val qterms = queries.flatMap { case (qid, ts) => ts.map(t => (qid, t.toLowerCase)) }
      .toDF("query_id", "term")
    // restrict the postings to the query terms BEFORE the df aggregation:
    // df(t) only depends on t's own postings, and aggregating the whole
    // corpus vocabulary to then keep a handful of terms is the dominant
    // wasted shuffle of a repeated-query-batch workload
    val tfQ = tf.join(broadcast(qterms.select(col("term")).distinct()),
      Seq("term"), "left_semi")
    val dfr = tfQ.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = round(log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0)), 6).cast("decimal(18,6)")
    val tfNorm = round(col("tf") * (lit(k1) + lit(1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl)), 6)
      .cast("decimal(18,6)")
    val scored = broadcast(qterms)
      .join(tfQ, Seq("term"))
      .join(dfr, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), (idf * tfNorm).as("c"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("c")).cast("double"), 6).as("score"))
    Similarity.perQueryTopK(scored, k, idName = "doc_id")
  }

  /** Persist the BM25 retrieval index — postings `(doc_id, dl, term,
    * tf)` and the one-row `(n_docs, sum_dl)` stats — so later query
    * batches ([[bm25TopKFromIndex]]) never touch the corpus text again:
    * the [[Dedup.writeCorpusSignatures]] discipline applied to
    * retrieval. One tokenize pass at write time buys every later query
    * set a read of two narrow columnar relations; at 100 TB the corpus
    * text is the thing you cannot afford to re-tokenize per query
    * batch. */
  def writeBm25Index(df: DataFrame, textCol: String, idCol: String,
      dir: String): Unit = {
    val (tf, stats) = bm25Corpus(df, textCol, idCol)
    tf.write.mode("overwrite").parquet(s"$dir/postings")
    stats.write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Distinct-n diversity (Li et al. 2016, "A Diversity-Promoting
    * Objective Function for Neural Conversation Models"): per group,
    * the ratio of DISTINCT n-grams to total n-gram occurrences — the
    * standard mode-collapse detector for generation pipelines (a model
    * that answers everything with "I don't know" scores near zero) and
    * the same signal on the curation side flags template-generated
    * corpora. Exact half-up ppm per (group, n). Shape: one explode per
    * n (union branches over the same scan), then ONE two-level
    * aggregation — the inner (group, gram) agg partial-combines
    * map-side, so the shuffle carries per-group DISTINCT grams, never
    * the token stream. Returns `(<groupCol>, n, n_total, n_distinct,
    * distinct_ppm)`; groups with no n-grams at order n are absent
    * (nothing to measure). */
  def distinctNgramRatio(df: DataFrame, textCol: String, groupCol: String,
      ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(n => n >= 1 && n <= 8) &&
      ns.distinct.size == ns.size,
      s"ns must be distinct n-gram orders in [1, 8], got $ns")
    val toksed = Par.spread(df.filter(col(textCol).isNotNull)
      .select(col(groupCol), tokens(lower(col(textCol))).as("toks")))
    ns.map { n =>
      toksed.select(col(groupCol), explode(shingles(col("toks"), n)).as("g"))
        .groupBy(col(groupCol), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col(groupCol))
        .agg(sum(col("c")).as("n_total"), count(lit(1)).as("n_distinct"))
        .select(col(groupCol), lit(n).as("n"), col("n_total"),
          col("n_distinct"),
          expr("CAST((2 * CAST(n_distinct AS DECIMAL(38,0)) * 1000000 " +
            "+ n_total) div (2 * n_total) AS BIGINT)").as("distinct_ppm"))
    }.reduce(_ unionAll _)
  }

  /** ROUGE-L (Lin 2004) — the summarization/eval-harness overlap metric,
    * completing the eval family's generation axis (ranking: rankEval;
    * agreement: cohenKappa; votes: selfConsistency; code: passAtK):
    * token-level longest-common-subsequence precision/recall/F against
    * a reference. The LCS runs in the codegen'd [[graft.functions
    * .LcsTokens]] kernel (two-row DP per pair, map-only — ROUGE is a
    * per-example metric and never shuffles); P, R, F are EXACT half-up
    * ppm of integer ratios — F simplifies to `2·lcs/(n_ref + n_hyp)`
    * (the 2PR/(P+R) algebra collapses over a shared numerator), so no
    * float ever enters. Zero-token sides yield null for their ratio
    * (no reference is not a perfect recall); null strings propagate
    * null rows. Returns `(<idCol>, lcs, n_ref, n_hyp, p_ppm, r_ppm,
    * f_ppm)`. */
  def rougeL(df: DataFrame, refCol: String, hypCol: String,
      idCol: String = "doc_id"): DataFrame = {
    graft.functions.LcsTokens.register(df.sparkSession)
    df.select(col(idCol),
        call_function("lcs_tokens", col(refCol), col(hypCol)).cast("long")
          .as("lcs"),
        size(tokens(col(refCol))).cast("long").as("n_ref"),
        size(tokens(col(hypCol))).cast("long").as("n_hyp"))
      .withColumn("p_ppm", when(col("n_hyp") > 0,
        expr("(2 * lcs * 1000000 + n_hyp) div (2 * n_hyp)")))
      .withColumn("r_ppm", when(col("n_ref") > 0,
        expr("(2 * lcs * 1000000 + n_ref) div (2 * n_ref)")))
      .withColumn("f_ppm", when(col("n_ref") + col("n_hyp") > 0,
        expr("(4 * lcs * 1000000 + (n_ref + n_hyp)) " +
          "div (2 * (n_ref + n_hyp))")))
  }

  /** Self-Instruct novelty gate (Wang et al. 2022 §3.2: a generated
    * instruction joins the pool only if its ROUGE-L against EVERY
    * existing instruction stays under a threshold — the dedup that
    * keeps a bootstrapped instruction set diverse): each candidate is
    * rescored with exact token-LCS ROUGE-L F against its banded seed
    * matches, and `keep` = max F < `thresholdPpm`.
    *
    * Scale shape — the naive recipe is candidates × pool (quadratic,
    * the reference implementation literally loops): here candidate
    * pairs come from a RARE-TOKEN band (distinct (id, token) pairs on
    * both sides, tokens above `maxTokenDf` corpus document-frequency
    * dropped — the q_d2b stop-shingle cap applied to blocking), then
    * only banded pairs pay the LCS kernel (codegen'd two-row DP,
    * map-only per pair). The band is a documented-recall prefilter:
    * a pair overlapping ONLY in ubiquitous tokens is never rescored —
    * the standard Self-Instruct blocking trade, stated rather than
    * hidden; within the banded set the verdict is exact. A candidate
    * fanning past `maxPairsPerCand` banded matches trips an in-plan
    * raise (the dpoPairs cap discipline). Candidates with no banded
    * match keep with null evidence columns.
    *
    * DIVERGENCE from the sequential reference recipe, stated: the
    * pool here is the SEEDS ONLY, whereas Wang et al.'s loop grows
    * the pool with each accepted instruction — so two near-identical
    * candidates in ONE batch both pass this gate. Compose with
    * [[selfInstructIntraBatch]] (keep = both verdicts) to close that
    * hole, or iterate batches feeding survivors back as seeds for the
    * sequential semantics. Returns `(<idCol>, n_banded, max_f_ppm,
    * nearest_seed_id, keep)` — nearest seed ties to the LOWER seed
    * id. */
  def selfInstructFilter(cands: DataFrame, seeds: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      thresholdPpm: Long = 700000L, maxTokenDf: Int = 100,
      maxPairsPerCand: Int = 4096): DataFrame = {
    require(thresholdPpm >= 1, s"thresholdPpm must be >= 1")
    require(maxTokenDf >= 1, s"maxTokenDf must be >= 1")
    require(maxPairsPerCand >= 1, s"maxPairsPerCand must be >= 1")
    graft.functions.LcsTokens.register(cands.sparkSession)
    val ct = cands.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__cid"), col(textCol).as("__ctext"))
    val st = seeds.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__sid"), col(textCol).as("__stext"))
    def toksOf(df: DataFrame, id: String, text: String): DataFrame =
      df.select(col(id), explode(tokens(col(text))).as("tok")).distinct()
    val candTok = toksOf(ct, "__cid", "__ctext")
    val seedTok = toksOf(st, "__sid", "__stext")
    // corpus document frequency over BOTH sides; ubiquitous tokens
    // band nothing
    val rare = candTok.select(col("tok"))
      .unionAll(seedTok.select(col("tok")))
      .groupBy(col("tok")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxTokenDf)
      .select(col("tok"))
    val pairs = candTok.join(rare, Seq("tok"), "left_semi")
      .join(seedTok.join(rare, Seq("tok"), "left_semi"), Seq("tok"))
      .select(col("__cid"), col("__sid")).distinct()
      .localCheckpoint()
    val scored = pairs.join(ct, Seq("__cid")).join(st, Seq("__sid"))
      .select(col("__cid"), col("__sid"),
        call_function("lcs_tokens", col("__stext"), col("__ctext"))
          .cast("long").as("__lcs"),
        size(tokens(col("__stext"))).cast("long").as("__nr"),
        size(tokens(col("__ctext"))).cast("long").as("__nh"))
      .select(col("__cid"), col("__sid"),
        when(col("__nr") + col("__nh") > 0, expr(
          "(4 * __lcs * 1000000 + (__nr + __nh)) " +
            "div (2 * (__nr + __nh))")).otherwise(lit(0L)).as("__f"))
    val best = scored.groupBy(col("__cid"))
      .agg(count(lit(1)).as("n_banded"),
        min(struct((-col("__f")).as("__nf"), col("__sid").as("__id")))
          .as("__b"))
      .select(col("__cid"), col("n_banded"),
        (-col("__b.__nf")).as("max_f_ppm"),
        col("__b.__id").as("nearest_seed_id"))
    val out = ct.select(col("__cid"))
      .join(best, Seq("__cid"), "left")
      .select(col("__cid").as(idCol),
        coalesce(col("n_banded"), lit(0L)).as("n_banded"),
        col("max_f_ppm"), col("nearest_seed_id"),
        coalesce(col("max_f_ppm") < thresholdPpm, lit(true)).as("keep"))
    // cap guard: every output column carries the raise
    val sch = out.schema
    val boom = raise_error(concat(
      lit("selfInstructFilter: candidate "), col("__cid").cast("string"),
      lit(" has "), col("__np").cast("string"),
      lit(s" banded matches (cap $maxPairsPerCand) — each pays an LCS " +
        "rescore; lower maxTokenDf or raise the cap deliberately")))
    val offenders = pairs.groupBy(col("__cid"))
      .agg(count(lit(1)).as("__np"))
      .filter(col("__np") > maxPairsPerCand)
      .select(sch.map(f => boom.cast(f.dataType).as(f.name)): _*)
    out.unionAll(offenders)
  }

  /** Intra-batch Self-Instruct novelty stage — the same-batch hole in
    * [[selfInstructFilter]]'s seed gate closed: within ONE candidate
    * batch, a candidate keeps only if no LOWER-id candidate scores
    * ROUGE-L F ≥ `thresholdPpm` against it (lower-id-first keep — the
    * canonical-selection tie convention, deterministic and
    * order-free). Banding, LCS rescore, cap guard and arithmetic are
    * [[selfInstructFilter]]'s exactly, applied to the candidate×
    * candidate relation with `lowId < highId`.
    *
    * Semantics vs Wang et al.'s sequential loop, stated: the blocker
    * set here is EVERY lower-id candidate, not just previously
    * ACCEPTED ones — the one-pass relational reading. Since the
    * sequential pool is a subset of the lower-id set, this stage is
    * strictly CONSERVATIVE: it never keeps a candidate the sequential
    * loop would reject; in a reject-chain (a blocks b, b blocks c, a
    * doesn't block c) it may additionally reject c. Diversity is
    * preserved either way — the lowest member of every near-dup group
    * always survives. Returns `(<idCol>, n_banded, max_f_ppm,
    * nearest_lower_id, keep)` — null evidence for candidates with no
    * banded lower-id match. */
  def selfInstructIntraBatch(cands: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      thresholdPpm: Long = 700000L, maxTokenDf: Int = 100,
      maxPairsPerCand: Int = 4096): DataFrame = {
    require(thresholdPpm >= 1, s"thresholdPpm must be >= 1")
    require(maxTokenDf >= 1, s"maxTokenDf must be >= 1")
    require(maxPairsPerCand >= 1, s"maxPairsPerCand must be >= 1")
    graft.functions.LcsTokens.register(cands.sparkSession)
    val ct = cands.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__cid"), col(textCol).as("__ctext"))
    val (pairs, scored) = siIntraScoredPairs(ct, maxTokenDf)
    val best = scored.groupBy(col("__hi"))
      .agg(count(lit(1)).as("n_banded"),
        min(struct((-col("__f")).as("__nf"), col("__lo").as("__id")))
          .as("__b"))
      .select(col("__hi").as("__cid"), col("n_banded"),
        (-col("__b.__nf")).as("max_f_ppm"),
        col("__b.__id").as("nearest_lower_id"))
    val out = ct.select(col("__cid"))
      .join(best, Seq("__cid"), "left")
      .select(col("__cid").as(idCol),
        coalesce(col("n_banded"), lit(0L)).as("n_banded"),
        col("max_f_ppm"), col("nearest_lower_id"),
        coalesce(col("max_f_ppm") < thresholdPpm, lit(true)).as("keep"))
    val sch = out.schema
    val boom = raise_error(concat(
      lit("selfInstructIntraBatch: candidate "),
      col("__hi").cast("string"),
      lit(" has "), col("__np").cast("string"),
      lit(s" banded lower-id matches (cap $maxPairsPerCand) — each " +
        "pays an LCS rescore; lower maxTokenDf or raise the cap " +
        "deliberately")))
    val offenders = pairs.groupBy(col("__hi"))
      .agg(count(lit(1)).as("__np"))
      .filter(col("__np") > maxPairsPerCand)
      .select(sch.map(f => boom.cast(f.dataType).as(f.name)): _*)
    out.unionAll(offenders)
  }

  /** Banded `lo < hi` candidate pairs with their exact ROUGE-L F —
    * the shared intra-candidate relation under [[selfInstructIntraBatch]]
    * (one-pass verdicts) and [[selfInstructLoop]] (sequential-exact
    * pool growth). `ct` = `(__cid, __ctext)`, text non-null. Returns
    * (pairs `(__lo, __hi)` for the cap guard, scored
    * `(__hi, __lo, __f)`). */
  private def siIntraScoredPairs(ct: DataFrame,
      maxTokenDf: Int): (DataFrame, DataFrame) = {
    val candTok = ct
      .select(col("__cid"), explode(tokens(col("__ctext"))).as("tok"))
      .distinct()
    val rare = candTok.select(col("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxTokenDf)
      .select(col("tok"))
    val banded = candTok.join(rare, Seq("tok"), "left_semi")
    val pairs = banded.select(col("tok"), col("__cid").as("__lo"))
      .join(banded.select(col("tok"), col("__cid").as("__hi")), Seq("tok"))
      .filter(col("__lo") < col("__hi"))
      .select(col("__lo"), col("__hi")).distinct()
      .localCheckpoint()
    val scored = pairs
      .join(ct.select(col("__cid").as("__lo"), col("__ctext").as("__lt")),
        Seq("__lo"))
      .join(ct.select(col("__cid").as("__hi"), col("__ctext").as("__ht")),
        Seq("__hi"))
      .select(col("__hi"), col("__lo"),
        call_function("lcs_tokens", col("__lt"), col("__ht"))
          .cast("long").as("__lcs"),
        size(tokens(col("__lt"))).cast("long").as("__nr"),
        size(tokens(col("__ht"))).cast("long").as("__nh"))
      .select(col("__hi"), col("__lo"),
        when(col("__nr") + col("__nh") > 0, expr(
          "(4 * __lcs * 1000000 + (__nr + __nh)) " +
            "div (2 * (__nr + __nh))")).otherwise(lit(0L)).as("__f"))
    (pairs, scored)
  }

  /** Self-Instruct POOL-GROWING loop — Wang et al. 2022's ACTUAL
    * recipe (§3.2's bootstrap iterates: each accepted instruction
    * joins the pool and gates everything generated after it), composed
    * from the two existing stages: [[selfInstructFilter]]'s seed gate
    * supplies the pool-vs-candidate verdicts, [[siIntraScoredPairs]]
    * (the [[selfInstructIntraBatch]] relation) supplies the
    * candidate-vs-candidate evidence, and this loop resolves the
    * SEQUENTIAL-EXACT acceptance the one-pass stage deliberately
    * approximates. Generation order = id order (Self-Instruct assigns
    * ids as it generates), so the sequential greedy is: a candidate is
    * accepted iff it passes the seed gate AND no ACCEPTED lower-id
    * candidate scores F ≥ threshold against it. On a similarity chain
    * A~B~C (A≁C) the one-pass stage keeps {A}; this loop keeps
    * {A, C} — exactly the cited recipe (B is rejected, so it never
    * gates C).
    *
    * That greedy is the lexicographically-first maximal independent
    * set of the ≥threshold blocker DAG (lo < hi edges — acyclic by
    * construction), resolved LEVEL-SYNCHRONOUSLY rather than
    * one-candidate-at-a-time: each round decides every still-undecided
    * candidate whose blockers are all decided (accepted if none of
    * them was accepted), so rounds = longest blocker chain, not
    * candidate count — the [[graft.operators.Iterate]] discipline
    * (per-round checkpoints, empty-frontier convergence exit,
    * `maxRounds` cap with a NAMED error telling the caller the chain
    * is deeper than the cap). Candidates failing the seed gate are
    * rejected outright and never block anyone (a pool reject never
    * joins the pool).
    *
    * Returns one row per non-null-text candidate:
    * `(<idCol>, n_banded_seed, max_f_seed_ppm, nearest_seed_id,
    * seed_keep, blocked_by, keep)` — `blocked_by` = the LOWEST
    * accepted blocker for a chain-rejected candidate, null
    * otherwise. */
  def selfInstructLoop(cands: DataFrame, seeds: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      thresholdPpm: Long = 700000L, maxTokenDf: Int = 100,
      maxPairsPerCand: Int = 4096, maxRounds: Int = 32): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val seedGate = selfInstructFilter(cands, seeds, textCol, idCol,
        thresholdPpm, maxTokenDf, maxPairsPerCand)
      .select(col(idCol), col("n_banded").as("n_banded_seed"),
        col("max_f_ppm").as("max_f_seed_ppm"), col("nearest_seed_id"),
        col("keep").as("seed_keep"))
    val ct = cands.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__cid"), col(textCol).as("__ctext"))
    val (pairs, scored) = siIntraScoredPairs(ct, maxTokenDf)
    val nodes = graft.operators.Iterate.checkpoint(
      seedGate.filter(col("seed_keep"))
        .select(col(idCol).as("__cid")))
    val edges = graft.operators.Iterate.checkpoint(
      scored.filter(col("__f") >= thresholdPpm)
        .select(col("__lo"), col("__hi"))
        .join(nodes.select(col("__cid").as("__lo")), Seq("__lo"), "left_semi")
        .join(nodes.select(col("__cid").as("__hi")), Seq("__hi"), "left_semi"))
    var und = nodes
    var acc = nodes.limit(0)
    var round = 0
    var done = und.isEmpty
    while (round < maxRounds && !done) {
      val blockedByUndecided = edges
        .join(und.select(col("__cid").as("__lo")), Seq("__lo"), "left_semi")
        .select(col("__hi").as("__cid")).distinct()
      val decidable = und.join(blockedByUndecided, Seq("__cid"), "left_anti")
      val newAcc = decidable.join(
        edges.join(acc.select(col("__cid").as("__lo")), Seq("__lo"),
            "left_semi")
          .select(col("__hi").as("__cid")).distinct(),
        Seq("__cid"), "left_anti")
      acc = graft.operators.Iterate.checkpoint(acc.unionAll(newAcc))
      und = graft.operators.Iterate.checkpoint(
        und.join(decidable, Seq("__cid"), "left_anti"))
      done = und.isEmpty
      round += 1
    }
    if (!done) throw new IllegalStateException(
      s"selfInstructLoop: blocker chains deeper than maxRounds=" +
        s"$maxRounds are still undecided — raise maxRounds (rounds " +
        "track the longest ≥threshold similarity chain, not candidate " +
        "count) or lower thresholdPpm upstream")
    val blockedBy = edges
      .join(acc.select(col("__cid").as("__lo")), Seq("__lo"), "left_semi")
      .groupBy(col("__hi")).agg(min(col("__lo")).as("__bb"))
    val out = seedGate
      .join(acc.select(col("__cid").as(idCol))
        .withColumn("__acc", lit(true)), Seq(idCol), "left")
      .join(blockedBy.select(col("__hi").as(idCol), col("__bb")),
        Seq(idCol), "left")
      .select(col(idCol), col("n_banded_seed"), col("max_f_seed_ppm"),
        col("nearest_seed_id"), col("seed_keep"),
        when(col("seed_keep") && col("__acc").isNull, col("__bb"))
          .as("blocked_by"),
        coalesce(col("__acc"), lit(false)).as("keep"))
    // the shared pair relation caps once; re-raise under THIS schema
    val sch = out.schema
    val boom = raise_error(concat(
      lit("selfInstructLoop: candidate "), col("__hi").cast("string"),
      lit(" has "), col("__np").cast("string"),
      lit(s" banded lower-id matches (cap $maxPairsPerCand) — each " +
        "pays an LCS rescore; lower maxTokenDf or raise the cap " +
        "deliberately")))
    val offenders = pairs.groupBy(col("__hi"))
      .agg(count(lit(1)).as("__np"))
      .filter(col("__np") > maxPairsPerCand)
      .select(sch.map(f => boom.cast(f.dataType).as(f.name)): _*)
    out.unionAll(offenders)
  }

  /** Needle-in-a-haystack synthesizer — the long-context eval-data
    * build (Kamradt's NIAH; RULER, Hsieh et al. 2024): each document
    * becomes a haystack with ONE planted needle sentence ("the magic
    * number for document <id> is <hex>") inserted at a
    * hash-determined token position, so retrieval accuracy can be
    * binned by depth — the standard lost-in-the-middle probe. The
    * needle VALUE is itself salted (8 hex chars of the id's salted
    * key), so a model can never answer from the id alone, and the
    * expected answer rides in the output relation for the
    * [[Profile.exactMatch]]-style grading pass.
    *
    * Deterministic engine reading: position and value derive from
    * [[graft.operators.Sampling.saltedKey]] hashes (`salt|pos`,
    * `salt|val`) — a new salt replants every needle; `depth_ppm` =
    * position / token count in half-up ppm (null for a token-less
    * doc — the needle IS its whole text). Token-level fidelity:
    * segments re-join on single spaces (the [[tokens]] regime). Null
    * texts are excluded. Map-only — at 100 TB this is a pure codegen
    * scan stage. Returns `(<idCol>, n_tokens, needle_pos, depth_ppm,
    * answer, text_out)`. */
  def plantNeedles(docs: DataFrame, salt: String,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def h(tag: String): Column =
      conv(substring(graft.operators.Sampling.saltedKey(col(idCol),
        s"$salt|$tag"), 1, 8), 16, 10).cast("long")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
      .withColumn("__pos", h("pos") % (col("__n") + 1))
      .withColumn("__ans",
        substring(graft.operators.Sampling.saltedKey(col(idCol),
          s"$salt|val"), 1, 8))
      .withColumn("__needle", concat(lit("the magic number for document "),
        col(idCol).cast("string"), lit(" is "), col("__ans")))
      .select(col(idCol), col("__n").as("n_tokens"),
        col("__pos").as("needle_pos"),
        when(col("__n") > 0,
          expr("(2 * __pos * 1000000 + __n) div (2 * __n)"))
          .as("depth_ppm"),
        col("__ans").as("answer"),
        array_join(concat(
          slice(col("__t"), lit(1), col("__pos").cast("int")),
          array(col("__needle")),
          slice(col("__t"), (col("__pos") + 1).cast("int"),
            (col("__n") - col("__pos")).cast("int"))), " ")
          .as("text_out"))
  }

  /** Word error rate — the ASR/translation-eval companion to
    * [[rougeL]]: token-level Levenshtein distance (substitutions +
    * deletions + insertions at WORD granularity, the NIST sclite
    * convention) over the reference length. The distance runs in the
    * codegen'd [[graft.functions.EditDistTokens]] kernel (two-row DP
    * per pair, map-only — WER is a per-example metric and never
    * shuffles); `wer_ppm` is the EXACT half-up ppm of `edits/n_ref`
    * and may exceed 1e6 (a hypothesis can cost more edits than the
    * reference has words — real WER tooling reports >100% the same
    * way). An empty reference has no defined rate (null, not a fake
    * zero — the [[rougeL]] stance); an empty hypothesis against a
    * non-empty reference is n_ref deletions, WER exactly 1e6. Null
    * strings propagate null rows. Returns `(<idCol>, edits, n_ref,
    * n_hyp, wer_ppm)`. */
  def wer(df: DataFrame, refCol: String, hypCol: String,
      idCol: String = "doc_id"): DataFrame = {
    graft.functions.EditDistTokens.register(df.sparkSession)
    df.select(col(idCol),
        call_function("edit_dist_tokens", col(refCol), col(hypCol))
          .cast("long").as("edits"),
        size(tokens(col(refCol))).cast("long").as("n_ref"),
        size(tokens(col(hypCol))).cast("long").as("n_hyp"))
      .withColumn("n_ref", when(col("edits").isNotNull, col("n_ref")))
      .withColumn("n_hyp", when(col("edits").isNotNull, col("n_hyp")))
      .withColumn("wer_ppm", when(col("n_ref") > 0,
        expr("(2 * edits * 1000000 + n_ref) div (2 * n_ref)")))
  }

  /** CORPUS-level WER per group — the number ASR/MT reports actually
    * publish: TOTAL edits over TOTAL reference words (NOT the mean of
    * per-example rates — a corpus of many short perfect hypotheses and
    * one long disaster scores very differently under each; the
    * [[bleuCorpus]] counts-before-score stance). One group-keyed hash
    * aggregation over [[wer]]'s per-example relation; unscorable rows
    * (null sides) are excluded with their count NOT silently absorbed
    * — scorable `n_examples` is the denominator evidence. Returns
    * `(<groupCol>, n_examples, edits, n_ref, n_hyp, wer_ppm)`. */
  def werCorpus(df: DataFrame, refCol: String, hypCol: String,
      groupCol: String, idCol: String = "doc_id"): DataFrame = {
    val per = wer(df, refCol, hypCol, idCol)
    df.select(col(idCol), col(groupCol)).join(per, Seq(idCol))
      .filter(col("edits").isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_examples"), sum(col("edits")).as("edits"),
        sum(col("n_ref")).as("n_ref"), sum(col("n_hyp")).as("n_hyp"))
      .withColumn("wer_ppm", when(col("n_ref") > 0,
        expr("(2 * edits * 1000000 + n_ref) div (2 * n_ref)")))
  }

  /** SQuAD-style QA eval (Rajpurkar et al. 2016's official script):
    * token-bag F1 + exact match against MULTIPLE gold answers, the
    * extractive-QA / short-answer half of the eval family next to
    * [[rougeL]] (sequence overlap) and [[bleu]] (n-gram precision).
    * Normalization is the official script's: lowercase, strip
    * punctuation (every char outside `[a-z0-9\s]` after lowering),
    * whitespace-tokenize, drop article tokens (a/an/the). Per gold:
    * `m = Σ_tok min(count_gold, count_pred)` (bag intersection), `F1 =
    * 2m/(|gold|+|pred|)` as EXACT half-up ppm (the [[rougeL]] shared-
    * numerator collapse — no float), with the official empty-side rule
    * (either side normalizing to zero tokens scores 1e6 iff BOTH are
    * empty, else 0); EM compares the normalized token-joined strings.
    * The example's score is the MAX over its golds (the official
    * metric_max_over_ground_truths), EM true if ANY gold matches. Rows
    * with a null prediction or null golds array pass through all-null
    * (nothing to score ≠ scoring zero — the [[bleu]] stance); null
    * ELEMENTS inside the golds array normalize as empty strings.
    *
    * Scale shape: pred token counts build ONCE per example; the clip
    * is one (id, token)-keyed join against the per-gold counts and
    * everything aggregates by example id — partitions trivially, never
    * quadratic (golds per example are single digits). Returns
    * `(<idCol>, n_golds, exact_match, best_f1_ppm)`. */
  def qaEval(df: DataFrame, goldsCol: String, predCol: String,
      idCol: String = "doc_id"): DataFrame = {
    def normToks(c: Column): Column =
      filter(tokens(regexp_replace(lower(coalesce(c, lit(""))),
        "[^a-z0-9\\s]", "")), t => !t.isin("a", "an", "the"))
    val base = Par.spread(
      df.filter(col(goldsCol).isNotNull && col(predCol).isNotNull)
        .select(col(idCol).as("__id"), col(goldsCol).as("__gs"),
          normToks(col(predCol)).as("__pt")))
    val predCnt = base.select(col("__id"), explode(col("__pt")).as("tok"))
      .groupBy(col("__id"), col("tok")).agg(count(lit(1)).as("__cp"))
    val golds = base.select(col("__id"),
        posexplode(col("__gs")).as(Seq("__gi", "__g")))
      .withColumn("__gt", normToks(col("__g")))
    val goldCnt = golds
      .select(col("__id"), col("__gi"), explode(col("__gt")).as("tok"))
      .groupBy(col("__id"), col("__gi"), col("tok"))
      .agg(count(lit(1)).as("__cg"))
    val m = goldCnt.join(predCnt, Seq("__id", "tok"))
      .groupBy(col("__id"), col("__gi"))
      .agg(sum(least(col("__cg"), col("__cp"))).as("__m"))
    val perGold = golds
      .select(col("__id"), col("__gi"), size(col("__gt")).as("__ng"),
        concat_ws(" ", col("__gt")).as("__gn"))
      .join(base.select(col("__id"), size(col("__pt")).as("__np"),
        concat_ws(" ", col("__pt")).as("__pn")), Seq("__id"))
      .join(m, Seq("__id", "__gi"), "left")
      .withColumn("__m", coalesce(col("__m"), lit(0L)))
      .withColumn("__f1",
        when(col("__ng") === 0 || col("__np") === 0,
          when(col("__ng") === 0 && col("__np") === 0, lit(1000000L))
            .otherwise(lit(0L)))
        .otherwise(expr(
          "(4 * __m * 1000000 + (__ng + __np)) div (2 * (__ng + __np))")))
      .withColumn("__em",
        when(col("__gn") === col("__pn"), 1L).otherwise(0L))
    val perId = perGold.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_golds"), max(col("__em")).as("__ema"),
        max(col("__f1")).as("best_f1_ppm"))
      .select(col("__id").as(idCol), col("n_golds"),
        (col("__ema") === 1L).as("exact_match"), col("best_f1_ppm"))
    df.select(col(idCol)).join(perId, Seq(idCol), "left")
  }

  /** CORPUS-level QA eval per group — SQuAD's published numbers: the
    * exact-match RATE and the MEAN of per-example best-F1 (the one
    * corpus metric in the family that IS a mean — the official script
    * averages per-question scores, unlike BLEU/WER's count totals;
    * both conventions live here deliberately, each labeled). One
    * group-keyed hash aggregation over [[qaEval]]'s per-example
    * relation; unscorable rows (null pred/golds) excluded. Returns
    * `(<groupCol>, n_examples, n_exact, em_ppm, mean_f1_ppm)`. */
  def qaEvalCorpus(df: DataFrame, goldsCol: String, predCol: String,
      groupCol: String, idCol: String = "doc_id"): DataFrame = {
    val per = qaEval(df, goldsCol, predCol, idCol)
    df.select(col(idCol), col(groupCol)).join(per, Seq(idCol))
      .filter(col("n_golds").isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_examples"),
        sum(when(col("exact_match"), 1L).otherwise(0L)).as("n_exact"),
        sum(col("best_f1_ppm")).as("__f1s"))
      .select(col(groupCol), col("n_examples"), col("n_exact"),
        expr("(2 * n_exact * 1000000 + n_examples) div (2 * n_examples)")
          .as("em_ppm"),
        expr("(2 * __f1s + n_examples) div (2 * n_examples)")
          .as("mean_f1_ppm"))
  }

  /** Sentence BLEU (Papineni et al. 2002, sacrebleu conventions) — the
    * MT/generation metric next to [[rougeL]]: clipped n-gram precisions
    * at orders 1–4 as EXACT integer counts (`m_n` = Σ_g min(hyp count,
    * ref count), `t_n` = max(|hyp|−n+1, 0)), geometric mean over the
    * EFFECTIVE orders (those with `t_n > 0` — the sacrebleu
    * `effective_order` stance for short hypotheses), brevity penalty
    * `exp(1−|ref|/|hyp|)` when the hypothesis is shorter (the |h|=|r|
    * edge is penalty-free). Arithmetic contract: counts stay integers;
    * each included order contributes ONE 6-dp-rounded ln (the q_x27 /
    * knScoreCore discipline); their mean and the BP exponent are exact
    * half-up micros; one final exp rounds to 6 dp. Any included order
    * with zero matches — or an empty/over-long-only hypothesis — scores
    * 0 exactly (unsmoothed BLEU). Null ref/hyp rows pass through
    * all-null (nothing to score ≠ scoring zero).
    *
    * Shape: per-example metric over EVAL batches — BOTH sides' grams
    * union into ONE side-tagged relation, so the clipped count is a
    * single (id, order, gram)-keyed hash aggregation (per-gram
    * `least(hyp count, ref count)`) with no join at all; everything is
    * keyed by example id, so it partitions trivially and never goes
    * quadratic. Returns `(<idCol>, n_ref, n_hyp, m1, t1, m2, t2, m3,
    * t3, m4, t4, eff_order, bleu)`. */
  def bleu(df: DataFrame, refCol: String, hypCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val scored = bleuScoreTail(bleuCountsWide(df, refCol, hypCol, idCol))
      .select(Seq(col("__id").as(idCol), col("n_ref"), col("n_hyp")) ++
        (1 to 4).flatMap(n => Seq(col(s"m$n"), col(s"t$n"))) ++
        Seq(col("eff_order"), col("bleu")): _*)
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
  }

  /** CORPUS-level BLEU per group — sacrebleu's actual default
    * granularity (and the number papers report): clipped matches and
    * totals SUM over the group's examples BEFORE the geometric mean,
    * and the brevity penalty compares total lengths — which is NOT the
    * mean of the per-sentence scores (a corpus with many short perfect
    * hyps and one long miss scores very differently under each). The
    * arithmetic tail is [[bleu]]'s exactly (shared code): effective
    * order degenerates only for corpora whose every hypothesis is
    * shorter than n; a zero-match order still zeroes the group
    * (unsmoothed). One extra group-keyed hash aggregation over the
    * per-example count relation — same scale shape. Returns
    * `(<groupCol>, n_examples, n_ref, n_hyp, m1, t1, …, m4, t4,
    * eff_order, bleu)`. */
  def bleuCorpus(df: DataFrame, refCol: String, hypCol: String,
      groupCol: String, idCol: String = "doc_id"): DataFrame = {
    val wide = bleuCountsWide(df, refCol, hypCol, idCol)
      .join(df.select(col(idCol).as("__id"), col(groupCol)), Seq("__id"))
    val aggs = Seq(count(lit(1)).as("n_examples"),
      sum(col("n_ref")).as("n_ref"), sum(col("n_hyp")).as("n_hyp")) ++
      (1 to 4).flatMap(n => Seq(sum(col(s"m$n")).as(s"m$n"),
        sum(col(s"t$n")).as(s"t$n")))
    val agg = wide.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    bleuScoreTail(agg)
      .select(Seq(col(groupCol), col("n_examples"), col("n_ref"),
        col("n_hyp")) ++
        (1 to 4).flatMap(n => Seq(col(s"m$n"), col(s"t$n"))) ++
        Seq(col("eff_order"), col("bleu")): _*)
  }

  /** The shared BLEU counting stage: per example, token lengths plus
    * clipped n-gram matches and totals at orders 1–4 (`__id, n_ref,
    * n_hyp, m1, t1, …, m4, t4`). */
  private def bleuCountsWide(df: DataFrame, refCol: String,
      hypCol: String, idCol: String): DataFrame = {
    // map-only: the native bleu_matches kernel computes all four clipped
    // match counts per example in one projection pass — the relational
    // 8-branch shingle explode and its two keyed aggregations (plus the
    // counts-to-lens join) are gone, and with them every exchange
    // (guide §2.4). The four element_at reads share ONE kernel subtree
    // (codegen subexpression elimination).
    graft.functions.BleuMatches.register(df.sparkSession)
    val scorable = Par.spread(
      df.filter(col(refCol).isNotNull && col(hypCol).isNotNull)
        .select(col(idCol).as("__id"), col(refCol).as("__r"),
          col(hypCol).as("__h")))
    val withM = scorable.select(col("__id"),
      size(tokens(col("__r"))).cast("long").as("n_ref"),
      size(tokens(col("__h"))).cast("long").as("n_hyp"),
      call_function("bleu_matches", col("__r"), col("__h")).as("__mm"))
    (1 to 4).foldLeft(withM) { (d, n) =>
      d.withColumn(s"m$n", element_at(col("__mm"), n))
        .withColumn(s"t$n", greatest(col("n_hyp") - lit(n - 1), lit(0L)))
    }.drop("__mm")
  }

  /** The shared BLEU arithmetic tail over an (n_ref, n_hyp, m1..t4)
    * relation — per example ([[bleu]]) or per group ([[bleuCorpus]]):
    * effective-order 6-dp-ln geometric mean, half-up-micro brevity
    * penalty, one final exp, unsmoothed zero on any zero-match
    * included order. */
  private def bleuScoreTail(d0: DataFrame): DataFrame = {
    val effOrder = (1 to 4).map(n => when(col(s"t$n") > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    val anyZero = (1 to 4).map(n => col(s"t$n") > 0 && col(s"m$n") === 0)
      .reduce(_ || _)
    val lpSum = (1 to 4).map(n => when(col(s"t$n") > 0 && col(s"m$n") > 0,
        round(log(col(s"m$n").cast("double") / col(s"t$n").cast("double")), 6)
          .cast("decimal(18,6)"))
      .otherwise(lit(BigDecimal(0)).cast("decimal(18,6)"))).reduce(_ + _)
    d0.withColumn("eff_order", effOrder)
      .withColumn("__sum_u", (lpSum * lit(1000000L)).cast("long"))
      .withColumn("__mean_u", when(col("eff_order") > 0,
        expr("(2 * __sum_u + eff_order) div (2 * eff_order)")))
      .withColumn("__bp_u", when(col("n_hyp") >= col("n_ref"), lit(0L))
        .otherwise(expr(
          "(2 * (n_hyp - n_ref) * 1000000 + n_hyp) div (2 * n_hyp)")))
      .withColumn("bleu",
        when(col("n_hyp") === 0 || col("eff_order") === 0 || anyZero,
          lit(0.0))
        .otherwise(round(exp((col("__mean_u") + col("__bp_u"))
          .cast("double") / lit(1000000.0)), 6)))
      .drop("__sum_u", "__mean_u", "__bp_u")
  }

  /** chrF (Popović 2015, sacrebleu conventions) — the character-level
    * generation metric completing the [[bleu]] pair: whitespace strips
    * entirely, char n-grams at orders 1–6 count clipped matches per
    * order, per-order precision/recall average ARITHMETICALLY across
    * orders, and F folds them with β=2 (recall-weighted). Orders beyond
    * the string contribute zero P/R (the sacrebleu all-orders stance —
    * no effective-order rescue at the character level). EVERYTHING is
    * exact integers: per-order P/R as half-up ppm, their means as
    * half-up ppm of ppms, the final `5·P·R / (4·P + R)` in half-up ppm
    * — no ln, no exp, no libm anywhere, so the score replays
    * bit-for-bit in any engine. Null ref/hyp rows pass through
    * all-null; a hyp/ref pair with no characters at all scores 0 (both
    * sums empty). Same side-tagged single-aggregation shape as
    * [[bleu]] (no join) — a per-example metric that partitions by
    * example id; the char-level row blowup (≤ 6·len per side) is the
    * documented price and stays inside the eval batch. Returns
    * `(<idCol>, n_ref_chars, n_hyp_chars, p_ppm, r_ppm, chrf_ppm)`. */
  def chrF(df: DataFrame, refCol: String, hypCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val scored = chrFScoreTail(chrFCountsWide(df, refCol, hypCol, idCol))
      .select(col("__id").as(idCol), col("n_ref_chars"),
        col("n_hyp_chars"), col("p_ppm"), col("r_ppm"), col("chrf_ppm"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
  }

  /** CORPUS-level chrF per group — sacrebleu's default granularity
    * (matches and totals SUM over the group's examples per order, THEN
    * the per-order precisions/recalls form and average — not the mean
    * of per-sentence scores). Arithmetic tail shared with [[chrF]]:
    * pure half-up-ppm integers end to end, no libm. One extra
    * group-keyed hash aggregation over the per-example count relation.
    * Returns `(<groupCol>, n_examples, n_ref_chars, n_hyp_chars,
    * p_ppm, r_ppm, chrf_ppm)`. */
  def chrFCorpus(df: DataFrame, refCol: String, hypCol: String,
      groupCol: String, idCol: String = "doc_id"): DataFrame = {
    val wide = chrFCountsWide(df, refCol, hypCol, idCol)
      .join(df.select(col(idCol).as("__id"), col(groupCol)), Seq("__id"))
    val aggs = Seq(count(lit(1)).as("n_examples"),
      sum(col("n_ref_chars")).as("n_ref_chars"),
      sum(col("n_hyp_chars")).as("n_hyp_chars")) ++
      (1 to 6).flatMap(n => Seq(sum(col(s"__mm$n")).as(s"__mm$n"),
        sum(col(s"__th$n")).as(s"__th$n"),
        sum(col(s"__tr$n")).as(s"__tr$n")))
    val agg = wide.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    chrFScoreTail(agg)
      .select(col(groupCol), col("n_examples"), col("n_ref_chars"),
        col("n_hyp_chars"), col("p_ppm"), col("r_ppm"), col("chrf_ppm"))
  }

  /** The shared chrF counting stage: per example, whitespace-stripped
    * char lengths plus clipped char-n-gram matches and both sides'
    * totals at orders 1–6 (`__id, n_ref_chars, n_hyp_chars, __mm1,
    * __th1, __tr1, …`). */
  private def chrFCountsWide(df: DataFrame, refCol: String,
      hypCol: String, idCol: String): DataFrame = {
    // map-only: the native chrf_matches kernel computes all six clipped
    // match counts per example in one projection pass — the relational
    // 12-branch explode (6 orders × 2 sides, ≤ 6·len rows per side) and
    // its two keyed aggregations are gone, and with them every exchange
    // (guide §2.4: remove shuffles outright). The six element_at reads
    // share ONE kernel subtree (whole-stage codegen's subexpression
    // elimination evaluates it once per row).
    graft.functions.ChrfMatches.register(df.sparkSession)
    val scorable = Par.spread(df
      .filter(col(refCol).isNotNull && col(hypCol).isNotNull)
      .select(col(idCol).as("__id"),
        regexp_replace(col(refCol), "\\s+", "").as("__r"),
        regexp_replace(col(hypCol), "\\s+", "").as("__h")))
    val withM = scorable.select(col("__id"),
      length(col("__r")).cast("long").as("n_ref_chars"),
      length(col("__h")).cast("long").as("n_hyp_chars"),
      call_function("chrf_matches", col("__r"), col("__h")).as("__mm"))
    (1 to 6).foldLeft(withM) { (d, n) =>
      d.withColumn(s"__mm$n", element_at(col("__mm"), n))
        .withColumn(s"__th$n",
          greatest(col("n_hyp_chars") - lit(n - 1), lit(0L)))
        .withColumn(s"__tr$n",
          greatest(col("n_ref_chars") - lit(n - 1), lit(0L)))
    }.drop("__mm")
  }

  /** The shared chrF arithmetic tail over an (__mm, __th, __tr)-wide
    * relation — per example or per group: per-order half-up-ppm P/R,
    * their arithmetic means across orders 1–6, β=2 fold. */
  private def chrFScoreTail(d0: DataFrame): DataFrame = {
    val withPr = (1 to 6).foldLeft(d0) { (d, n) =>
      d.withColumn(s"__p$n", when(col(s"__th$n") > 0, expr(
          s"(2 * __mm$n * 1000000 + __th$n) div (2 * __th$n)"))
          .otherwise(lit(0L)))
        .withColumn(s"__r$n", when(col(s"__tr$n") > 0, expr(
          s"(2 * __mm$n * 1000000 + __tr$n) div (2 * __tr$n)"))
          .otherwise(lit(0L)))
    }
    withPr
      .withColumn("p_ppm", expr(s"(2 * (${(1 to 6).map(n => s"__p$n")
        .mkString(" + ")}) + 6) div 12"))
      .withColumn("r_ppm", expr(s"(2 * (${(1 to 6).map(n => s"__r$n")
        .mkString(" + ")}) + 6) div 12"))
      .withColumn("chrf_ppm",
        when(lit(4L) * col("p_ppm") + col("r_ppm") > 0, expr(
          "(2 * 5 * p_ppm * r_ppm + (4 * p_ppm + r_ppm)) " +
            "div (2 * (4 * p_ppm + r_ppm))"))
        .otherwise(lit(0L)))
  }

  /** Tokenizer fertility — pieces per word, per group (the standard
    * multilingual tokenizer-quality audit: a tokenizer trained on one
    * language's distribution fragments the others, and fertility per
    * language is how that bias is SEEN before it taxes every training
    * step). Takes any per-doc relation carrying a piece count (
    * [[unigramTokenize]]'s `n_sp`, [[bpeTokenize]]'s `n_bpe`) and a
    * word count; emits per group the doc/piece/word totals and the
    * exact half-up fertility in ppm (1e6 = one piece per word). One
    * hash aggregation; DECIMAL(38,0) for the ppm product (corpus piece
    * counts × 1e6 pass a long at ~9e12 pieces). Zero-word groups carry
    * a null fertility. Returns `(<groupCol>, n_docs, n_pieces,
    * n_words, fertility_ppm)`. */
  def tokenizerFertility(perDoc: DataFrame, groupCol: String,
      pieceCol: String, wordCol: String): DataFrame =
    perDoc.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(pieceCol)).cast("long").as("n_pieces"),
        sum(col(wordCol)).cast("long").as("n_words"))
      .withColumn("fertility_ppm", when(col("n_words") > 0, expr(
        "CAST((2 * CAST(n_pieces AS DECIMAL(38,0)) * 1000000 + n_words) " +
          "div (2 * n_words) AS BIGINT)")))

  /** Final-answer extraction — the GSM8K / eval-harness convention: a
    * model completion's answer is the LAST number it states (earlier
    * numbers are working steps). Thousands-separating commas are
    * stripped first; the match covers an optional sign and decimal
    * part; a completion with no number extracts null (an abstention —
    * exactly what [[Profile.selfConsistency]] counts without voting).
    * Map-only, codegen'd regex — compose with the vote for the
    * standard extract → majority-vote eval chain. */
  def finalAnswer(completion: Column): Column = {
    val all = regexp_extract_all(regexp_replace(completion, ",", ""),
      lit("-?\\d+(\\.\\d+)?"), lit(0))
    when(size(all) > 0, element_at(all, -1))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle"):
    * code/infilling corpora train with a fraction of documents
    * rearranged PSM — `<PRE> prefix <SUF> suffix <MID> middle` — so the
    * model learns to complete a span given BOTH sides. Deterministic
    * md5 draws (the [[Profile.dpCounts]] seeded stance: a salt replays
    * bit-for-bit, a new salt redraws): selection by u32-vs-`fimPpm`
    * exact long compare, the two cut points by independent md5 draws
    * mod (len+1), ordered lo ≤ hi — empty prefix/middle/suffix spans
    * are legitimate outcomes (the paper keeps them; a document is
    * never "too short to FIM"). Sentinels are caller-chosen literals
    * (match your tokenizer's specials). Unselected and null-text docs
    * pass through untouched with `fim = false`. Map-only — at 100 TB
    * this is a pure codegen'd scan stage. Returns
    * `(<idCol>, fim, text_out)`. */
  def fimTransform(df: DataFrame, textCol: String, idCol: String,
      salt: String, fimPpm: Long = 500000L,
      preTok: String = "<PRE>", sufTok: String = "<SUF>",
      midTok: String = "<MID>"): DataFrame = {
    require(fimPpm >= 0 && fimPpm <= 1000000L,
      s"fimPpm must be in [0, 1e6], got $fimPpm")
    def u32(tag: String) = conv(substring(md5(concat(
      lit(s"$salt|$tag|"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val n = length(col(textCol))
    val sel = col(textCol).isNotNull &&
      u32("sel") * 1000000L < lit(fimPpm) * 4294967296L
    val c1 = u32("c1") % (n + 1)
    val c2 = u32("c2") % (n + 1)
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    df.select(col(idCol), sel.as("fim"),
      when(sel, concat(lit(preTok),
          col(textCol).substr(lit(1), lo.cast("int")),
          lit(sufTok),
          col(textCol).substr((hi + 1).cast("int"), n.cast("int")),
          lit(midTok),
          col(textCol).substr((lo + 1).cast("int"), (hi - lo).cast("int"))))
        .otherwise(col(textCol)).as("text_out"))
  }

  /** Opt-out purge of a persisted BM25 index — the retrieval half of
    * the right-to-be-forgotten contract: after the purge, the revoked
    * docs can never be RETRIEVED again ([[bm25TopKFromIndex]] ranks
    * only what the postings contain). The purged doc ids append to
    * `dir/tombstones` first (audit + idempotent re-run), the postings
    * drop the ids via the recoverable staged swap, and the stats row is
    * recomputed EXACTLY (`n_docs`/`sum_dl` minus the purged docs'
    * contribution, derived from the pre-purge postings — per-term `df`
    * is derived at query time from the postings, so it self-corrects).
    * Copy-on-write over the postings: batch revocations nightly. */
  def purgeBm25Index(spark: SparkSession, dir: String,
      purgedIds: DataFrame, idCol: String = "doc_id"): Unit = {
    val ids = purgedIds.select(col(idCol).as("doc_id")).distinct()
    ids.write.mode("append").parquet(s"$dir/tombstones")
    // the purged docs' (doc_id, dl) BEFORE the postings rewrite
    val gone = spark.read.parquet(s"$dir/postings")
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("__nd"), coalesce(sum(col("dl")), lit(0L)).as("__dl"))
      .head()
    graft.sources.Sinks.rewriteParquet(spark, s"$dir/postings",
      _.join(broadcast(ids), Seq("doc_id"), "left_anti"))
    graft.sources.Sinks.rewriteParquet(spark, s"$dir/stats",
      _.select((col("n_docs") - lit(gone.getLong(0))).as("n_docs"),
        (col("sum_dl") - lit(gone.getLong(1))).as("sum_dl")))
  }

  /** [[bm25TopK]] against a PERSISTED index ([[writeBm25Index]] output)
    * instead of the corpus: byte-identical scores (exact-integer stats
    * → the same derived avgdl; the registered query shares q_x28's
    * oracle verbatim — output equality is the proof), but the corpus
    * text is never scanned. */
  def bm25TopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, queries: Seq[(Int, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Score(spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/stats"), queries, k, k1, b)

  /** Feature-hashing vectorizer (Weinberger et al. 2009, "Feature
    * Hashing for Large Scale Multitask Learning" — the HashingTF
    * shape): every token hashes to one of `dims` buckets
    * ([[Sampling.bucketOfKey]], the library's one shared md5
    * derivation) and the document becomes the dense vector of bucket
    * term-frequencies — a fixed-width embedding with no vocabulary to
    * build, broadcast, or keep in sync. This is the model-free bridge
    * from text onto the ENTIRE vector stack ([[Kmeans]] topic
    * clustering, [[Similarity]] ANN/near-dup, [[Pq]] compression):
    * cosine over hashed-tf profiles is classic bag-of-words similarity.
    *
    * Counts are exact integers narrowed to float (exact to 2^24), so
    * vectors replay bit-for-bit in a relational oracle. Documents with
    * no tokens are EXCLUDED (a zero vector has no cosine direction —
    * same contract as the Pq zero-norm rule). Map-only except the one
    * (doc, bucket) counting aggregation; the per-doc reassembly buffer
    * is bounded by `dims`.
    *
    * Returns `(doc_id, vec: array<float>)` with `vec.length == dims`. */
  def hashedTfVectors(df: DataFrame, textCol: String, idCol: String,
      dims: Int): DataFrame = {
    require(dims >= 2 && dims <= 65536, s"dims must be in [2, 65536], got $dims")
    // map-only: the native token_tf_vec kernel emits the dense
    // dims-length vector per doc in one projection pass — the explode →
    // md5 → two keyed aggregations → dims-length transform reassembly
    // are gone, and with them both exchanges (guide §2.4)
    graft.functions.TokenTfVec.register(df.sparkSession)
    Par.spread(df.select(col(idCol).as("doc_id"),
        tokens(lower(col(textCol))).as("toks")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        call_function("token_tf_vec", col("toks"), lit(dims)).as("vec"))
  }

  /** Persist BOTH sides of the hybrid-retrieval index in one corpus
    * pass: the BM25 postings/stats ([[writeBm25Index]]) under
    * `dir/bm25` and the hashed-TF document vectors
    * ([[hashedTfVectors]]) under `dir/vecs` — so every later hybrid
    * query batch ([[hybridTopKFromIndex]]) reads two narrow stores and
    * NEVER re-tokenizes the corpus. At 100 TB the corpus text is the
    * thing you cannot afford to touch per query batch; this is the
    * [[Dedup.writeCorpusSignatures]] nightly discipline applied to the
    * fused retrieval path. */
  def writeHybridIndex(df: DataFrame, textCol: String, idCol: String,
      dims: Int, dir: String): Unit = {
    writeBm25Index(df, textCol, idCol, s"$dir/bm25")
    hashedTfVectors(df, textCol, idCol, dims)
      .write.mode("overwrite").parquet(s"$dir/vecs")
  }

  /** Hybrid retrieval from PERSISTED stores only: BM25 ranks from the
    * `dir/bm25` index, dense cosine ranks from the `dir/vecs` hashed-TF
    * vector store, fused by [[Similarity.rrfFuse]] — the query path a
    * nightly pipeline actually runs, with the corpus text never in the
    * plan (spec-pinned). Scores are byte-identical to the in-job chain
    * (exact-integer postings and vectors persist losslessly), so the
    * registered query shares the in-job query's oracle VERBATIM —
    * output equality is the proof. The dense side stays the exact
    * brute-force scan BY DESIGN: routing it through the IVF centroid
    * store would trade recall for speed and break rank parity with the
    * oracle; swap in [[Similarity.ivfTopKWith]] candidates when
    * approximate dense recall is acceptable. `dims` must match the
    * dims the store was written with (the query vectors must live in
    * the same hashed space). Returns `(query_id, doc_id, rrf, rnk)`. */
  def hybridTopKFromIndex(spark: SparkSession, dir: String,
      queries: Seq[(Int, Seq[String])], k: Int, dims: Int,
      rrfK: Int = 60): DataFrame = {
    import spark.implicits._
    val bm25 = bm25TopKFromIndex(spark, s"$dir/bm25", queries, k)
      .select(col("query_id"), col("doc_id"), col("rnk"))
    val docVecs = spark.read.parquet(s"$dir/vecs")
    val qVecs = hashedTfVectors(
      queries.map { case (qid, terms) => (qid, terms.mkString(" ")) }
        .toDF("qid", "qtext"), "qtext", "qid", dims)
      .select(col("doc_id").as("query_id"), col("vec").as("qv"))
    val dense = Similarity.perQueryTopK(
      docVecs.crossJoin(broadcast(qVecs))
        .select(col("query_id"), col("doc_id").as("neighbor_id"),
          Similarity.cosine(col("qv"), col("vec")).as("score")), k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rnk"))
    Similarity.rrfFuse(Seq(bm25, dense), k, rrfK)
  }

  /** Train the linear quality classifier IN-ENGINE — the fastText-style
    * loop closed (train on labeled seed docs → score the corpus), the
    * training half [[linearQualityScore]] was missing: fixed-round BATCH
    * PERCEPTRON over the hashed-TF relation in exact integer weight
    * units (the Kmeans.train replay discipline — fixed rounds, pure
    * integer arithmetic, a relational oracle unrolls the rounds as
    * CTEs; float gradients would make partial-agg order observable).
    *
    * Per round: margin_d = Σ_b w_b·tf_db (one keyed sum against the
    * broadcast dims-sized weight relation), prediction `margin ≥ 0`,
    * and the batch update `w_b += Σ_{misclassified d} y_d·tf_db` (one
    * aggregation over the misclassified docs' tf rows — y ∈ {+1,−1}).
    * Weights start at zero, so round 1 reduces to `w = −Σ_{y=−1} tf`:
    * deterministic from the first step. Scale: each round is two passes
    * over the (doc, bucket, tf) relation (checkpointed once) + a
    * dims-sized state merge — the weight state never exceeds `dims`
    * rows however large the corpus. Labeled docs with a null label or
    * zero tokens carry no tf rows and cannot move a weight (a doc the
    * tokenizer sees as empty has no gradient). Returns `(bucket, wm)`
    * ready for [[linearQualityScore]] (weight units ARE the milli slot:
    * one update step = one milli). */
  def trainLinearQuality(df: DataFrame, labelCol: String, dims: Int,
      rounds: Int, textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    require(dims >= 2 && dims <= 65536, s"dims must be in [2, 65536], got $dims")
    require(rounds >= 1 && rounds <= 16,
      s"need 1 <= rounds <= 16 (fixed-round replay contract), got $rounds")
    // map-only TF (the linearQualityScore kernel explode — guide §2.4).
    // The round loop itself stays RELATIONAL (broadcast weight join +
    // keyed sums): the seed set is curated-small, and an A/B of a
    // map-grain margin fold here measured SLOWER — the per-round weight
    // map aggregation + broadcast added driver stages that cost more
    // than the small shuffles they removed. The map-side fold lives
    // where the corpus is: linearQualityScore / langIdTrained.
    graft.functions.TokenBucketTf.register(df.sparkSession)
    val tf = Iterate.checkpoint(Par.spread(
        df.filter(col(labelCol).isNotNull)
          .select(col(idCol).as("doc_id"),
            when(col(labelCol).cast("boolean"), lit(1L)).otherwise(lit(-1L))
              .as("y"),
            tokens(lower(col(textCol))).as("toks")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("y"),
        explode(call_function("token_bucket_tf", col("toks"), lit(dims))))
      .select(col("doc_id"), col("y"), col("key").as("b"),
        col("value").as("tf")))
    var w = tf.select(col("b"), lit(0L).as("wm")).limit(0)
    (1 to rounds).foreach { _ =>
      val margins = tf
        .join(broadcast(w), Seq("b"), "left")
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("tf") * coalesce(col("wm"), lit(0L))).as("__m"))
      val mis = margins
        .filter((col("__m") >= 0) =!= (col("y") > 0))
        .select(col("doc_id"))
      val upd = tf.join(mis, Seq("doc_id"))
        .groupBy(col("b")).agg(sum(col("y") * col("tf")).as("__u"))
      w = Iterate.checkpoint(w.join(upd, Seq("b"), "full_outer")
        .select(col("b"),
          (coalesce(col("wm"), lit(0L)) + coalesce(col("__u"), lit(0L)))
            .as("wm")))
    }
    w.select(col("b").as("bucket"), col("wm"))
  }

  /** Hashed character-n-gram TF relation `(doc_id, b, tf)` — the
    * fastText-LID feature space (Joulin et al. 2016 use char n-grams
    * precisely because they survive domains where word-level stopwords
    * don't exist: short strings, code-mixed text, agglutinative
    * languages). All n-gram lengths in `[nMin, nMax]` over the LOWERED
    * text, hashed into `dims` md5 buckets (the [[hashedTfVectors]]
    * bucket derivation, so the oracle replays every bucket id).
    * Map-only array HOFs + one counting aggregation; partial agg
    * collapses each task's grams before the shuffle, so the exchanged
    * volume is per-doc DISTINCT buckets (≤ dims), not the gram
    * stream. Docs with null text or no grams are absent. */
  private[graft] def charGramTf(df: DataFrame, textCol: String,
      idCol: String, dims: Int, nMin: Int, nMax: Int): DataFrame = {
    // map-only: the native char_gram_tf kernel builds the whole
    // bucket→tf map per doc in one projection pass (same md5-bucket
    // derivation as Sampling.bucketOfKey, one JVM definition) — the
    // per-gram-length position explodes (≤ len rows per length per
    // doc, an md5 each) and the (doc, bucket)-keyed counting
    // aggregation are gone (guide §2.4); consumers get the same
    // (doc_id, b, tf) relation from one explode of ≤ dims map entries.
    charGramTfMap(df, textCol, idCol, dims, nMin, nMax)
      .select(col("doc_id"), explode(col("__tf")))
      .select(col("doc_id"), col("key").as("b"), col("value").as("tf"))
  }

  /** [[charGramTf]] at the map grain: `(doc_id, __tf: map<bucket, tf>)`
    * — one kernel pass per doc, no explode at all. The margin loops
    * ([[trainLangId]], [[langIdTrained]]) consume this directly: a
    * doc×class margin is a fold over ≤ dims map entries against the
    * broadcast weight map, so no (doc, bucket)-grain relation is ever
    * shuffled. Docs with null text or no grams are absent (same
    * contract as [[charGramTf]]). */
  private def charGramTfMap(df: DataFrame, textCol: String,
      idCol: String, dims: Int, nMin: Int, nMax: Int): DataFrame = {
    graft.functions.CharGramTf.register(df.sparkSession)
    Par.spread(df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), lower(col(textCol)).as("__t")))
      .select(col("doc_id"),
        call_function("char_gram_tf", col("__t"),
          lit(dims), lit(nMin), lit(nMax)).as("__tf"))
      .filter(size(map_keys(col("__tf"))) > 0)
  }

  /** Exact integer margin Σ_b tf_b · w_b between the doc's TF map and a
    * broadcast bucket→weight map column — the map-side replacement for
    * the (doc, bucket)-grain join + keyed sum (zero shuffle; long
    * arithmetic, order-independent, bit-identical). Runs as the native
    * [[graft.functions.MapMargin]] kernel: the equivalent
    * `aggregate(map_entries(…))` HOF is CodegenFallback and measurably
    * slower. A null weight map (a class absent from a round's weight
    * state) contributes 0, like the old left join's coalesce. Callers
    * must register the kernel ([[graft.functions.MapMargin.register]]). */
  private def mapMargin(tfMap: Column, wMap: Column): Column =
    coalesce(call_function("map_margin", tfMap, wMap), lit(0L))

  /** Train language ID IN-ENGINE — the multi-class (one-vs-rest)
    * extension of [[trainLinearQuality]], closing the gap between the
    * 4-language stopword [[langId]] heuristic and what production
    * pipelines actually run (a trained char-n-gram linear model, the
    * fastText-LID shape): per class c, a batch perceptron with
    * `y_dc = (label_d == c) ? +1 : −1` over the
    * [[charGramTf]] hashed features, all classes trained in ONE
    * relational loop (the weight state is keyed `(lang, bucket)` —
    * ≤ |classes|·dims rows however large the corpus, broadcast each
    * round). Same fixed-round exact-integer replay contract as the
    * binary trainer: weights start at zero, round 1 collapses to
    * `w_cb = −Σ_{y=−1} tf`, a relational oracle unrolls the rounds.
    *
    * Scale: the per-class feature replica (`tflc`) is the labeled
    * docs' tf relation × |classes| — classes are enum-like (a LID
    * label set is tens, not millions), and the SEED set is
    * curated-small by construction (you label thousands of docs, then
    * classify billions), so the training relation never approaches
    * corpus size. Each round is two passes over the checkpointed
    * replica + a classes×dims-sized state merge. Labeled docs with a
    * null label are excluded; docs with no grams carry no gradient.
    * Returns `(lang, bucket, wm)` for [[langIdTrained]]. */
  def trainLangId(df: DataFrame, langCol: String, dims: Int, rounds: Int,
      nMin: Int = 2, nMax: Int = 4, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(dims >= 2 && dims <= 65536, s"dims must be in [2, 65536], got $dims")
    require(rounds >= 1 && rounds <= 16,
      s"need 1 <= rounds <= 16 (fixed-round replay contract), got $rounds")
    require(nMin >= 1 && nMax >= nMin && nMax <= 8,
      s"need 1 <= nMin <= nMax <= 8, got [$nMin, $nMax]")
    // The round loop stays RELATIONAL over the exploded (doc, c, b, tf)
    // replica (broadcast weight join + keyed sums): the seed set is
    // curated-small, and an A/B of a map-grain margin fold here
    // measured SLOWER — the per-round nested-weight-map aggregation +
    // broadcast added driver stages that cost more than the small
    // shuffles they removed. The map-side fold lives where the corpus
    // is: [[langIdTrained]]'s classify stage.
    val lab = df.filter(col(langCol).isNotNull)
    val tfl = charGramTf(lab, textCol, idCol, dims, nMin, nMax)
      .join(lab.select(col(idCol).as("doc_id"),
        col(langCol).cast("string").as("__lang")), Seq("doc_id"))
    val cls = tfl.select(col("__lang").as("c")).distinct()
    val tflc = Iterate.checkpoint(tfl.crossJoin(broadcast(cls))
      .select(col("doc_id"), col("c"),
        when(col("__lang") === col("c"), 1L).otherwise(-1L).as("y"),
        col("b"), col("tf")))
    var w = tflc.select(col("c"), col("b"), lit(0L).as("wm")).limit(0)
    (1 to rounds).foreach { _ =>
      val margins = tflc.join(broadcast(w), Seq("c", "b"), "left")
        .groupBy(col("doc_id"), col("c"), col("y"))
        .agg(sum(col("tf") * coalesce(col("wm"), lit(0L))).as("__m"))
      val mis = margins.filter((col("__m") >= 0) =!= (col("y") > 0))
        .select(col("doc_id"), col("c"))
      val upd = tflc.join(mis, Seq("doc_id", "c"))
        .groupBy(col("c"), col("b")).agg(sum(col("y") * col("tf")).as("__u"))
      w = Iterate.checkpoint(w.join(upd, Seq("c", "b"), "full_outer")
        .select(col("c"), col("b"),
          (coalesce(col("wm"), lit(0L)) + coalesce(col("__u"), lit(0L)))
            .as("wm")))
    }
    w.select(col("c").as("lang"), col("b").as("bucket"), col("wm"))
  }

  /** Trained language-ID INFERENCE: per document, the argmax of
    * per-class integer margins against a [[trainLangId]] weight
    * relation, ties broken by class name ascending (fixed class-order
    * tiebreak — deterministic across engines). The margin spine is the
    * doc's tf relation × the weight relation's classes (bounded); the
    * argmax is a packed-long `max_by` HASH aggregate (the
    * [[Similarity.assignToCentroids]] discipline — a doc-partitioned
    * window would pay a SortAggregate for the same answer): class
    * names rank into a dense index by sorted order (the class list is
    * the weight relation's — enum-sized, a bounded driver read), and
    * `(margin desc, name asc)` packs as `margin·2²⁰ − idx`. An in-plan
    * raise guards the shift headroom (|margin| < 2⁴², far past any
    * real margin — the knScoreCore overflow stance). EVERY input doc
    * gets a verdict (the [[linearQualityScore]] observability stance):
    * docs with no grams — null or empty text — surface with `lang`
    * null (no characters, no evidence; guessing would be worse than
    * honesty). Returns `(doc_id, lang, margin_m)`. */
  def langIdTrained(df: DataFrame, weights: DataFrame, dims: Int,
      nMin: Int = 2, nMax: Int = 4, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(dims >= 2 && dims <= 65536, s"dims must be in [2, 65536], got $dims")
    val sp = df.sparkSession
    import sp.implicits._
    val w = weights.select(col("lang").as("c"),
      col("bucket").cast("long").as("b"),
      col("wm").cast("long"))
    // bounded driver read: the class list is enum-sized by the
    // trainLangId contract (the weight relation is classes × dims)
    val classNames = w.select(col("c")).distinct()
      .collect().map(_.getString(0)).sorted
    require(classNames.length < (1 << 20),
      s"langIdTrained: ${classNames.length} classes exceed the 2^20 " +
        "packing space — a LID label set is tens, not millions")
    val cls = classNames.zipWithIndex
      .map { case (c, i) => (c, i.toLong) }.toSeq.toDF("c", "__ci")
    graft.functions.MapMargin.register(df.sparkSession)
    // margins map-side (the trainLangId fold): per (doc, class) one
    // fold over ≤ dims TF-map entries against the broadcast nested
    // weight map — the (doc, class, bucket)-grain join + keyed sum and
    // its exchange are gone (guide §2.4); identical integer arithmetic
    val wMap = w.groupBy(col("c"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("wm"))))
        .as("__wc"))
      .agg(map_from_entries(collect_list(struct(col("c"), col("__wc"))))
        .as("__w"))
    val scored = charGramTfMap(df, textCol, idCol, dims, nMin, nMax)
      .crossJoin(broadcast(cls))
      .crossJoin(broadcast(wMap))
      .select(col("doc_id"), col("__ci"),
        mapMargin(col("__tf"), element_at(col("__w"), col("c")))
          .as("margin_m"))
    val guarded = when(abs(col("margin_m")) > lit(1L << 42),
        raise_error(concat(lit("langIdTrained: |margin| for doc "),
          col("doc_id").cast("string"),
          lit(" exceeds 2^42 and would overflow the packed argmax — " +
            "rescale the weights or shorten the docs"))))
      .otherwise(col("margin_m"))
    val best = scored.groupBy(col("doc_id"))
      .agg(max_by(col("__ci"), guarded * lit(1L << 20) - col("__ci"))
          .as("__ci"),
        max(col("margin_m")).as("margin_m"))
      .join(broadcast(cls), Seq("__ci"))
      .select(col("doc_id"), col("c").as("lang"), col("margin_m"))
    df.select(col(idCol).as("doc_id")).join(best, Seq("doc_id"), "left")
  }

  /** Model-based quality filtering — LINEAR classifier INFERENCE over
    * the hashed-TF features (the fastText-style quality gate every
    * modern curation stack runs; training happens offline, which is not
    * this engine's job — scoring the corpus is). Weights arrive as a
    * `(bucket: int, wm: long)` relation in integer MILLI-units plus a
    * milli bias: quantized weights make the score an EXACT integer sum
    * (order-independent, engine-replayable — the PageRank micro-unit
    * discipline applied to model inference; float weights would make
    * the partial-aggregation order observable in the last ulps).
    *
    * Shape: the (doc, bucket, tf) relation (one counting aggregation —
    * the [[hashedTfVectors]] chain without the dense reassembly) joins
    * the broadcast vocab-sized weight relation, one keyed sum, and a
    * keys-sized left join back so EVERY doc gets a verdict — token-less
    * docs score the bare bias (a quality gate must not silently drop
    * the very docs most likely to be junk). Returns `(doc_id, score_m:
    * long, accept: boolean)` with accept = score_m ≥ thresholdM. */
  def linearQualityScore(df: DataFrame, weights: DataFrame, biasM: Long,
      dims: Int, thresholdM: Long = 0L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(dims >= 2 && dims <= 65536, s"dims must be in [2, 65536], got $dims")
    // map-only TF: one explode of the ≤ dims kernel-map entries per doc
    // replaces the per-token explode + md5 + (doc, bucket)-keyed
    // counting aggregation (guide §2.4 — the counting shuffle is gone)
    // score map-side (the trainLangId fold): one fold over ≤ dims
    // TF-map entries per doc against the broadcast bucket→weight map —
    // no (doc, bucket)-grain explode, no keyed-sum exchange
    // (guide §2.4); identical integer arithmetic
    graft.functions.TokenBucketTf.register(df.sparkSession)
    graft.functions.MapMargin.register(df.sparkSession)
    val wMap = weights
      .select(col("bucket").cast("long").as("b"), col("wm").cast("long"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("wm"))))
        .as("__w"))
    val scored = Par.spread(df.select(col(idCol).as("doc_id"),
        tokens(lower(col(textCol))).as("toks")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        call_function("token_bucket_tf", col("toks"), lit(dims))
          .as("__tf"))
      .crossJoin(broadcast(wMap))
      .select(col("doc_id"), mapMargin(col("__tf"), col("__w")).as("__s"))
    df.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("__s"), lit(0L)) + lit(biasM)).as("score_m"))
      .withColumn("accept", col("score_m") >= thresholdM)
  }

  /** Content-defined chunking (the rolling-hash boundary rule of
    * LBFS/rsync-family dedup, relationalized): a chunk boundary falls
    * AFTER token i exactly when the hash of the k-gram ENDING at i is
    * ≡ 0 mod `divisor` — so boundaries are decided by local content,
    * not position, and an insertion near the head re-chunks only up to
    * the next surviving boundary (fixed windows shift EVERY downstream
    * span — [[graft.operators.Dedup.spanDedup]]'s known weakness, and
    * why CDC is the chunker of storage dedup). Expected chunk length ≈
    * `divisor` tokens; docs shorter than k tokens are one chunk.
    *
    * Entirely map-only — zero shuffle: boundary positions come from the
    * native `cdc_cuts` kernel (one O(n·k) pass, one md5 per gram —
    * replacing the HOF formulation whose nested lambdas re-evaluated
    * the whole shingle array per gram index), and chunk slices are
    * array HOFs over the materialized cut column; the downstream
    * chunk-hash dedup/df is whatever keyed consumer the caller composes
    * (the md5 is emitted per chunk for exactly that).
    *
    * Returns `(doc_id, c, chunk, chunk_hash)` with `c` the 0-based
    * chunk ordinal; chunks reassemble to the document in order. */
  def cdcChunks(df: DataFrame, textCol: String, idCol: String,
      k: Int = 4, divisor: Int = 16): DataFrame = {
    require(k >= 1, s"gram size k must be >= 1, got $k")
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    // cut positions via the native cdc_cuts kernel (one pass, one md5
    // per gram) — the HOF formulation re-evaluated the whole shingle
    // array per gram index inside interpreted lambdas (O(n²·k) string
    // work per doc); parity pinned by GramKernelsSpec + the q_x36 oracle
    graft.functions.CdcCuts.register(df.sparkSession)
    val toksed = Par.spread(df.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("toks")))
      .filter(size(col("toks")) > 0)
    toksed
      .withColumn("cuts",
        call_function("cdc_cuts", col("toks"), lit(k), lit(divisor)))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("cuts")) - 1),
          ci => array_join(slice(col("toks"),
            element_at(col("cuts"), ci) + 1,
            element_at(col("cuts"), ci + 1) - element_at(col("cuts"), ci)),
            " ")))
          .as(Seq("c", "chunk")))
      .withColumn("chunk_hash", md5(col("chunk")))
  }

  /** Within-document dedup: drop every repeat of a token, keeping first
    * occurrences in document order — the intra-doc analogue of corpus
    * dedup (boilerplate/navigation strings repeat INSIDE crawled pages).
    * Two keyed hash aggregations: first-position per (doc, token), then
    * re-assembly by sorting each doc's kept (position, token) pairs inside
    * its aggregation buffer — an O(kept·log kept) per-doc sort, never a
    * corpus-wide sort. */
  def dedupTokensKeepFirst(df: DataFrame, textCol: String, idCol: String): DataFrame =
    Par.spread(df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks")))
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .groupBy(col("doc_id"), col("tok"))
      .agg(min(col("pos")).as("p"), count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(array_sort(collect_list(struct(col("p"), col("tok")))),
          s => s.getField("tok"))).as("dedup_text"),
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_kept"))

  /** Unicode-normalize a string column via the native codegen'd kernel
    * ([[graft.functions.UnicodeNormalize]]) — the canonicalization pass
    * that must precede hash-keyed dedup on crawl text (composed vs
    * decomposed accents hash differently; NFKC additionally folds
    * ligatures/full-width forms). `form`: NFC|NFD|NFKC|NFKD. */
  def normalizeUnicode(spark: org.apache.spark.sql.SparkSession,
      c: Column, form: String = "NFKC"): Column = {
    graft.functions.UnicodeNormalize.register(spark)
    call_function("unicode_normalize", c, lit(form))
  }

  /** Encoding-artifact (mojibake) detection — the web-corpus hygiene
    * gate next to [[normalizeUnicode]]: UTF-8 text decoded once too
    * often as Latin-1/cp1252 leaves telltale sequences ("Ã©" where é
    * was meant, "â€™" for a curly apostrophe, "Â" riding a
    * non-breaking space), and outright decode failures leave U+FFFD
    * replacement characters. Counts both per document with one
    * map-only non-overlapping regexp pass — the patterns are LITERAL
    * alternations, so Java regex and RE2 agree by construction (the
    * [[piiPatterns]] portability rule) — and flags documents carrying
    * either. Deliberately not a fixer: re-decoding is lossy guesswork;
    * the flag routes documents to quarantine or re-crawl. Null text
    * counts as clean (0/0, flag false). */
  val mojibakePattern: String =
    "Ã©|Ã¨|Ã¡|Ã¤|Ã¶|Ã¼|Ã±|â€™|â€œ|â€“|â€”|Â "

  def mojibakeFlags(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      coalesce(regexp_count(col(textCol), lit(mojibakePattern)), lit(0))
        .cast("long").as("n_artifacts"),
      coalesce(regexp_count(col(textCol), lit("�")), lit(0))
        .cast("long").as("n_replacement"))
      .withColumn("mojibake", col("n_artifacts") > 0 || col("n_replacement") > 0)

  /** One-row corpus DATASHEET — the "dataset card" numbers a training
    * corpus ships with: document count, token total / mean / median,
    * empty-document count, and the exact-duplicate rate
    * (docs − distinct content hashes, over docs). ONE aggregation pass
    * over the token-counted projection — the count-distinct rides the
    * same shuffle as the sums. Null text counts as an empty doc (0
    * tokens) and is excluded from the dup-rate numerator (no hash).
    * Counts are exact; each ratio is a single rounded division (the
    * house numeric discipline), so the row hashes identically across
    * engines. */
  def corpusCard(df: DataFrame, textCol: String): DataFrame = {
    // __nt is coalesced AT THE SOURCE so every statistic — including the
    // median, whose percentile() would otherwise skip nulls — sees a
    // null-text doc as exactly 0 tokens (the documented semantics).
    val t = df.select(
      md5(col(textCol)).as("__h"),
      coalesce(size(tokens(col(textCol))), lit(0)).as("__nt"))
    val nt0 = col("__nt")
    t.agg(
      count(lit(1)).as("n_docs"),
      sum(nt0).cast("long").as("n_tokens"),
      round(sum(nt0).cast("double") / count(lit(1)), 6).as("avg_tokens"),
      round(expr("percentile(__nt, 0.5)"), 4).as("p50_tokens"),
      sum(when(nt0 === 0, 1L).otherwise(0L)).cast("long").as("n_empty"),
      round((count(col("__h")) - countDistinct(col("__h"))).cast("double") /
        count(lit(1)), 6).as("dup_rate"))
  }

  /** PII patterns for training-corpus redaction, in APPLICATION ORDER:
    * URLs replace first so an address inside a link redacts as part of
    * the link, not as a second partial hit. Regex subset chosen to mean
    * the same thing under Java regex (Spark) and RE2 (DuckDB oracle):
    * classes, bounded repeats, and `\b` only — no backrefs/lookaround.
    * Patterns are lowercase-text oriented (corpus convention); callers
    * with mixed-case text should lower() first. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^\\s]+", "<URL>"),
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\b\\+?[0-9]{3}[- .][0-9]{3,4}[- .][0-9]{4}\\b", "<PHONE>"))

  /** Redact every PII pattern to its placeholder token. Map-only chain
    * of codegen'd `regexp_replace` — at 100 TB this is a pure scan
    * stage, no shuffle, no UDF. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, p, t)) => regexp_replace(c, p, t) }

  /** Sliding-window document chunking — the RAG / context-window prep
    * shape: each document splits into `chunkTokens`-token windows that
    * advance by `chunkTokens - overlap`, so consecutive chunks share
    * `overlap` tokens of context. A window is emitted only if it adds
    * tokens beyond the previous window's end (`start = 0` or
    * `start + overlap < n`), so no chunk is a pure suffix of its
    * predecessor; the final chunk may be shorter than the budget.
    * Zero-token documents yield zero chunks.
    *
    * Map-only: tokenize, enumerate starts, slice — one generator
    * expression per document inside the scan's codegen stage, no
    * shuffle, no UDF. Returns
    * `(<idCol>, chunk_id, chunk_tokens, chunk_text)` with
    * `chunk_id = start / stride` (dense from 0 per document). */
  def chunk(docs: DataFrame, chunkTokens: Int, overlap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap of $chunkTokens")
    val stride = chunkTokens - overlap
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
    val starts = when(col("n") === 0, array().cast("array<int>"))
      .otherwise(filter(sequence(lit(0), col("n") - 1, lit(stride)),
        s => (s === 0) || (s + lit(overlap) < col("n"))))
    base.withColumn("s", explode(starts))
      .select(col(idCol),
        (col("s") / lit(stride)).cast("int").as("chunk_id"),
        least(lit(chunkTokens), col("n") - col("s")).as("chunk_tokens"),
        concat_ws(" ", slice(col("toks"), col("s") + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }

  /** Per-kind PII hit counts over the ORIGINAL text (counted before any
    * replacement, so overlapping kinds are attributed to every pattern
    * that matches — the audit-trail convention). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (k, p, _) =>
      s"n_${k}s" -> regexp_count(text, lit(p))
    }

  /** Flesch reading-ease readability (Flesch 1948) — the curation
    * gate's classic complexity axis next to the Gopher structural
    * rules (educational-quality pipelines band corpora by readability
    * before mixing):
    *
    *   206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    *
    * in exact integer MICROS: the two ratios are half-up-micro
    * rationals (per-term rounding, the BLEU discipline), the constants
    * exact micro literals, the score their integer combination — so
    * both engines replay it bit-for-bit, and a dense legalese doc goes
    * honestly NEGATIVE (real Flesch does). Deterministic count
    * conventions (heuristics, pinned): words = whitespace tokens;
    * sentences = `[.!?]+` terminator runs, floored at 1 (a fragment is
    * one sentence, not a division by zero); syllables = `[aeiouy]+`
    * vowel groups per lowercased word, floored at 1 per word. Docs
    * with zero words band as 'empty' with a null score (nothing
    * measured ≠ unreadable). Map-only except the one doc-keyed
    * syllable aggregation. Returns `(<idCol>, n_words, n_sentences,
    * n_syllables, flesch_micro, band)`. */
  def fleschReadability(df: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val base = Par.spread(df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        tokens(lower(col(textCol))).as("__toks"),
        greatest(lit(1L),
          regexp_count(col(textCol), lit("[.!?]+")).cast("long"))
          .as("n_sentences")))
    val syl = base.select(col("__id"), explode(col("__toks")).as("__w"))
      .select(col("__id"), greatest(lit(1L),
        regexp_count(col("__w"), lit("[aeiouy]+")).cast("long")).as("__s"))
      .groupBy(col("__id")).agg(sum(col("__s")).as("n_syllables"))
    base.select(col("__id"), size(col("__toks")).cast("long").as("n_words"),
        col("n_sentences"))
      .join(syl, Seq("__id"), "left")
      .withColumn("n_syllables", coalesce(col("n_syllables"), lit(0L)))
      .withColumn("flesch_micro", when(col("n_words") > 0,
        lit(206835000L) -
          expr("(2 * 1015000L * n_words + n_sentences) " +
            "div (2 * n_sentences)") -
          expr("(2 * 84600000L * n_syllables + n_words) " +
            "div (2 * n_words)")))
      .withColumn("band",
        when(col("n_words") === 0, lit("empty"))
          .when(col("flesch_micro") >= 90000000L, lit("very_easy"))
          .when(col("flesch_micro") >= 70000000L, lit("easy"))
          .when(col("flesch_micro") >= 50000000L, lit("standard"))
          .when(col("flesch_micro") >= 30000000L, lit("difficult"))
          .otherwise(lit("very_difficult")))
      .select(col("__id").as(idCol), col("n_words"), col("n_sentences"),
        col("n_syllables"), col("flesch_micro"), col("band"))
  }

  /** Collocation / phrase mining (Mikolov et al. 2013's word2vec
    * phrase score) — the corpus-prep step that decides which adjacent
    * word pairs deserve a single token ("new york", "machine
    * learning") before vocabulary learning:
    *
    *   score(a b) = (C(ab) − δ) · N / (C(a)·C(b))
    *
    * with δ the rare-pair discount and N the corpus token count. The
    * raw form is used PRECISELY because it needs no logarithm: the
    * score is ONE exact cross-multiplied rational in DECIMAL(38,0),
    * emitted as half-up micros — no PMI ln, nothing to round, the
    * oracle replays every row (the NPMI variant buys normalization at
    * the price of three lns; the threshold is calibrated per corpus
    * either way, so the exact form wins). Bigrams below `minCount`
    * occurrences never surface (Mikolov's min-count prune — rare pairs
    * are noise and the relation stays bounded); a pair whose count is
    * ≤ δ scores 0 exactly (the discount exists to kill it, not to go
    * negative). `is_phrase` gates at `thresholdMicros`.
    *
    * Scale shape: the [[bigramPerplexity]] training shape exactly —
    * two hash aggregations whose shuffled volume is DISTINCT
    * bigrams/unigrams (map-side combine absorbs the token stream),
    * two keyed joins of the surviving bigram relation against the
    * unigram counts, one broadcast 1-row N. Returns `(gram, c_ab,
    * c_a, c_b, score_micros, is_phrase)`. */
  def phraseMining(df: DataFrame, textCol: String, minCount: Long = 5L,
      delta: Long = 5L, thresholdMicros: Long = 1000000L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(delta >= 0, s"delta must be >= 0, got $delta")
    val toksed = Par.spread(df.filter(col(textCol).isNotNull)
      .select(tokens(lower(col(textCol))).as("toks")))
    val uni = toksed.select(explode(col("toks")).as("w"))
    val uniCnt = uni.groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val n = uni.agg(count(lit(1)).as("__n"))
    toksed.select(explode(shingles(col("toks"), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .withColumn("__a", split(col("gram"), " ").getItem(0))
      .withColumn("__b", split(col("gram"), " ").getItem(1))
      .join(uniCnt.select(col("w").as("__a"), col("cu").as("c_a")),
        Seq("__a"))
      .join(uniCnt.select(col("w").as("__b"), col("cu").as("c_b")),
        Seq("__b"))
      .crossJoin(broadcast(n))
      .withColumn("score_micros", expr(
        s"(2 * greatest(CAST(c_ab AS DECIMAL(38,0)) - $delta, 0) * __n " +
          "* 1000000 + CAST(c_a AS DECIMAL(38,0)) * c_b) " +
          "div (2 * CAST(c_a AS DECIMAL(38,0)) * c_b)"))
      .withColumn("is_phrase", col("score_micros") >= thresholdMicros)
      .select(col("gram"), col("c_ab"), col("c_a"), col("c_b"),
        col("score_micros"), col("is_phrase"))
  }

  /** Payment-card (PAN) detection with LUHN checksum validation — the
    * false-positive cut every DLP scanner applies before quarantining:
    * a 16-digit order number matches any PAN-shaped regex, but only a
    * checksum-valid number is evidence of leaked card data (ISO/IEC
    * 7812; the mod-10 algorithm is public since 1960). Candidates are
    * 13–23-char runs of digits with space/dash separators (the portable
    * regex subset — classes, bounded repeats, `\b`; the 13-char floor
    * means a separator-free run carries ≥13 digits); the exact 13–19
    * DIGIT-count cut is applied in the validation step below, so a
    * separator-padded 12-digit run can still surface as a candidate but
    * never validates;
    * each candidate's digits reverse and fold through the alternating
    * double-with-digit-sum entirely in array HOFs over exact integers
    * — both engines replay it bit-for-bit, no UDF. Candidates are
    * rare, so the HOF cost is paid only where a match exists. Per doc:
    * `(doc_id, n_candidates, n_valid, has_pan)` — route `has_pan` to
    * quarantine, keep `n_candidates - n_valid` as the
    * false-positive-rate monitor. */
  def panAudit(df: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val cands = regexp_extract_all(col(textCol),
      lit("\\b[0-9][0-9 -]{11,21}[0-9]\\b"), lit(0))
    // digits only, 13..19 of them, then the Luhn fold over the REVERSED
    // digit string (positions 1-based: odd add, even double-minus-9)
    val valid = filter(cands, c => {
      val d = reverse(regexp_replace(c, "[^0-9]", ""))
      length(d) >= 13 && length(d) <= 19 &&
        aggregate(sequence(lit(1), length(d)), lit(0),
          (acc, i) => {
            val dig = d.substr(i, lit(1)).cast("int")
            acc + when(i % 2 === 1, dig)
              .otherwise(when(dig * 2 > 9, dig * 2 - 9).otherwise(dig * 2))
          }) % 10 === 0
    })
    df.select(col(idCol),
      coalesce(size(cands), lit(0)).cast("long").as("n_candidates"),
      coalesce(size(valid), lit(0)).cast("long").as("n_valid"))
      .withColumn("has_pan", col("n_valid") > 0)
  }

  /** High-entropy secret detection — the credential half of the DLP
    * pair next to [[panAudit]] (the detect-secrets / truffleHog
    * approach: keys and tokens are RANDOM, prose is not, so Shannon
    * entropy over a long unbroken key-alphabet run separates them
    * without a per-vendor pattern zoo). Candidates are maximal
    * `[A-Za-z0-9+/=_-]` runs of ≥ `minLen` chars (base64/hex/url-safe
    * alphabets); per candidate the char-distribution entropy in BITS:
    *
    *   H = ln N − (Σ_c k_c·ln k_c)/N, over ln 2
    *
    * computed under the exact-arithmetic contract: each ln rounds to
    * 6 dp (the q_x16/q_x27 cross-engine discipline), Σ k·ln k is exact
    * DECIMAL, both divisions are half-up integer micros, ln 2 is the
    * 6-dp constant 0.693147 — so a fully repeated char scores EXACTLY
    * 0 (its two ln terms cancel by construction) and both engines
    * replay the same micro-bits. A candidate flags as a secret at
    * `minBitsMicro` (default 4.0 bits/char: random base64 measures
    * ~4.2-4.6 at key lengths, hex ~3.5-4.0, English words ~2.5-3.2 —
    * calibrate per corpus; hex-heavy corpora want ~3.2e6 like
    * detect-secrets' hex limit).
    *
    * Scale shape: map-only candidate extraction (regex over the scan,
    * candidates are rare in prose); the char explode is per-candidate
    * only, and the two aggregations key by (doc, candidate) then doc —
    * partitions trivially. Returns `(<idCol>, n_candidates, n_secrets,
    * max_entropy_bits_micro)` (max null when a doc has no candidate —
    * nothing measured ≠ measuring zero). */
  def secretAudit(df: DataFrame, textCol: String,
      idCol: String = "doc_id", minLen: Int = 20,
      minBitsMicro: Long = 4000000L): DataFrame = {
    require(minLen >= 8, s"minLen must be >= 8, got $minLen")
    val base = Par.spread(df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        regexp_extract_all(col(textCol),
          lit(s"[A-Za-z0-9+/=_-]{$minLen,}"), lit(0)).as("__cs")))
    val cand = base.select(col("__id"),
      posexplode(col("__cs")).as(Seq("__ci", "__c")))
    val freq = cand
      .select(col("__id"), col("__ci"), length(col("__c")).as("__n"),
        explode(split(col("__c"), "")).as("__ch"))
      .groupBy(col("__id"), col("__ci"), col("__n"), col("__ch"))
      .agg(count(lit(1)).as("__k"))
    val ent = freq.groupBy(col("__id"), col("__ci"), col("__n"))
      .agg(sum(expr("__k * cast(round(ln(__k), 6) as decimal(18,6))"))
        .as("__klnk"))
      .withColumn("__klnk_u", (col("__klnk") * 1000000L).cast("long"))
      .withColumn("__lnn_u", (expr(
        "cast(round(ln(__n), 6) as decimal(18,6))") * 1000000L)
        .cast("long"))
      // floor at 0: true entropy is non-negative, but the two 6-dp ln
      // roundings could in principle leave -1 micro-nat, where Spark's
      // div (truncate) and an oracle's floor-division disagree
      .withColumn("__h_nat_u", greatest(lit(0L),
        col("__lnn_u") - expr("(2 * __klnk_u + __n) div (2 * __n)")))
      .withColumn("__h_bit_u",
        expr("(2 * __h_nat_u * 1000000 + 693147) div (2 * 693147)"))
    val perDoc = ent.groupBy(col("__id"))
      .agg(count(lit(1)).as("__nc"),
        sum(when(col("__h_bit_u") >= minBitsMicro, 1L).otherwise(0L))
          .as("__ns"),
        max(col("__h_bit_u")).as("__mx"))
    df.select(col(idCol))
      .join(perDoc.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nc"), lit(0L)).as("n_candidates"),
        coalesce(col("__ns"), lit(0L)).as("n_secrets"),
        col("__mx").as("max_entropy_bits_micro"))
  }
}
