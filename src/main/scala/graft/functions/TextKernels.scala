package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.array.ByteArrayMethods
import org.apache.spark.unsafe.types.UTF8String

/** Fused byte-level text kernels: tokenize-and-consume in ONE pass over
  * the raw UTF-8 buffer, never materializing the token array.
  *
  * The composed formulation — `split(text, " ")` feeding `size`,
  * `array_distinct`, [[ShingleHashes3]], [[SimHash64]] — pays a steep
  * allocation tax per row: Spark's `split` converts the UTF-8 bytes to a
  * `java.lang.String` (full decode), runs a regex split, then re-encodes
  * every token into a fresh `UTF8String`. On a 100 TB text corpus that is
  * the dominant CPU cost of the dedup/quality pipeline (measured: the
  * round-6 host does corpus_clean's string work 3–5× slower than its
  * joins). These kernels scan the value buffer once with zero decode and
  * zero per-token allocation; token boundaries are byte offsets (the
  * separator 0x20 never occurs inside a UTF-8 multi-byte sequence, so
  * byte-splitting ≡ character-splitting).
  *
  * Semantics are EXACTLY `split(text, " ")` with Spark's default
  * limit = -1: every space starts a new token, empty tokens (leading /
  * consecutive / trailing separators) are kept, so n_tokens = spaces + 1.
  * The hash chains match [[ShingleKernel]] / [[SimHashKernel]] seed-for-
  * seed, so fused and composed plans produce bit-identical results
  * (TextKernelsSpec pins the equivalence property-style, including
  * multi-byte UTF-8 and degenerate whitespace shapes).
  */
object TextKernel {

  /** Byte offsets of token starts in `s`, under split-on-0x20 semantics.
    * Returns n+1 ints: token i spans [st(i), st(i+1)-1) — the sentinel
    * st(n) = numBytes+1 makes every token's end uniform (one virtual
    * trailing separator), so callers never special-case the last token. */
  private def tokenStarts(s: UTF8String): Array[Int] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var spaces = 0
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val st = new Array[Int](spaces + 2)
    var t = 1
    i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) { st(t) = i + 1; t += 1 }
      i += 1
    }
    st(spaces + 1) = len + 1
    st
  }

  /** (n_tokens, n_types) in one pass. Distinctness is EXACT: the open-
    * addressing probe compares token bytes on hash equality (slots hold
    * token indices, not just hashes), so a 64-bit collision cannot
    * miscount — required because the driver hash-compares `n_types`
    * against DuckDB's `list_distinct` to the last row. */
  def tokenStats(s: UTF8String): InternalRow = {
    val st = tokenStarts(s)
    val n = st.length - 1
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var cap = 8
    while (cap < n * 2) cap <<= 1
    val slot = new Array[Int](cap)
    java.util.Arrays.fill(slot, -1)
    val hs = new Array[Long](cap)
    var types = 0
    var i = 0
    while (i < n) {
      val ts = st(i)
      val tl = st(i + 1) - 1 - ts
      val h = XXH64.hashUnsafeBytes(base, off + ts, tl, 42L)
      var p = (h & (cap - 1)).toInt
      var done = false
      while (!done) {
        val o = slot(p)
        if (o < 0) { slot(p) = i; hs(p) = h; types += 1; done = true }
        else if (hs(p) == h && {
          val os = st(o)
          st(o + 1) - 1 - os == tl &&
            ByteArrayMethods.arrayEquals(base, off + ts, base, off + os, tl)
        }) done = true
        else p = (p + 1) & (cap - 1)
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, types))
  }

  /** Compiled word list for [[wordCounts]], cached per comma-joined
    * literal (a plan-time constant — one entry per distinct list for
    * the life of the JVM, looked up once per row). */
  private val wordListCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Byte]]]()

  /** Occurrence count of EACH word of `words` (comma-joined plan-time
    * literal) among the split-on-0x20 tokens of `s`, one fused byte
    * pass, counts aligned with list order. Replaces one
    * `size(filter(split(text,' '), t -> t = word))` projection PER
    * word — which materializes the token array and then re-walks it
    * N times (measured 206 s for the 10-marker lang-ID scorer over the
    * 50M-doc mirror; this kernel: one pass, no array). Token equality
    * is exact byte equality, the `===`-on-UTF8String semantics. */
  def wordCounts(s: UTF8String, words: String): ArrayData = {
    val ws = wordListCache.computeIfAbsent(words,
      w => w.split(',').map(
        _.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val nw = ws.length
    val counts = new Array[Long](nw)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var ts = 0
    var i = 0
    while (i <= len) {
      if (i == len || Platform.getByte(base, off + i) == 0x20) {
        val tl = i - ts
        var w = 0
        while (w < nw) {
          val wb = ws(w)
          if (wb.length == tl) {
            var j = 0
            while (j < tl && Platform.getByte(base, off + ts + j) == wb(j)) {
              j += 1
            }
            if (j == tl) counts(w) += 1
          }
          w += 1
        }
        ts = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** PII redaction in ONE anchored byte pass — the scanner form of the
    * sequential triple
    * `regexp_replace(regexp_replace(regexp_replace(t, EMAIL, "<EMAIL>"),
    * PHONE, "<PHONE>"), SSN, "<ID>")` with
    * EMAIL = `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`,
    * PHONE = `\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}`,
    * SSN   = `[0-9]{3}-[0-9]{2}-[0-9]{4}`.
    *
    * Equivalence argument (each step pinned by the randomized suite
    * test against the actual regex composition):
    *  - every EMAIL match contains exactly one `@` (neither side class
    *    admits it); its local part is the maximal local-class run
    *    ending at that `@` — maximal because PHONE/SSN alphabets are
    *    subsets of the local class, so nothing matchable is ever
    *    left-adjacent to a local run; its domain end is the RIGHTMOST
    *    dot (Java's greedy `+` backtracks from the right) inside the
    *    maximal domain-class run that has ≥1 domain char before it and
    *    ≥2 letters after it, extended over the maximal letter run;
    *  - replacement tokens contain no pattern-class bytes, and the
    *    digit-group shapes of PHONE/SSN cannot span a removed EMAIL
    *    region, so one left-to-right pass with same-start priority
    *    email > phone > ssn (the sequential application order) yields
    *    the identical redacted string;
    *  - a local-class run whose terminator is not `@` (or whose domain
    *    has no valid dot) can host no email starting ANYWHERE inside
    *    it (all inner starts share the same run end), so the scanner
    *    marks the whole run failed and stays O(n).
    *
    * Replaces three full java.util.regex passes over the corpus (each
    * position re-attempted per pattern with backtracking) by one
    * anchored scan. Returns (redacted, n_email, n_phone, n_id). */
  def piiRedact(s: UTF8String): InternalRow = {
    val len = s.numBytes
    val src = s.getBytes
    val out = new java.io.ByteArrayOutputStream(len + 16)
    var nEmail = 0L; var nPhone = 0L; var nId = 0L
    def isDigit(b: Byte) = b >= '0' && b <= '9'
    def isAlpha(b: Byte) =
      (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
    def isLocal(b: Byte) = isAlpha(b) || isDigit(b) ||
      b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
    def isDomain(b: Byte) = isAlpha(b) || isDigit(b) ||
      b == '.' || b == '-'
    var i = 0
    var emailFailUntil = -1
    while (i < len) {
      val b = src(i)
      var matched = 0 // 0 none, else new position after the match
      // EMAIL, unless this local run already failed.
      if (isLocal(b) && i >= emailFailUntil) {
        var j = i
        while (j < len && isLocal(src(j))) j += 1
        if (j < len && src(j) == '@') {
          var k = j + 1
          while (k < len && isDomain(src(k))) k += 1
          // Rightmost dot with ≥1 domain char before, ≥2 letters after.
          var d = k - 1
          var end = -1
          while (d >= j + 2 && end < 0) {
            if (src(d) == '.' && d + 2 < k &&
                isAlpha(src(d + 1)) && isAlpha(src(d + 2))) {
              var p = d + 1
              while (p < k && isAlpha(src(p))) p += 1
              end = p
            } else d -= 1
          }
          if (end > 0) { out.write(EMAIL_TOK); nEmail += 1; matched = end }
          else emailFailUntil = j + 1
        } else emailFailUntil = j
      }
      // PHONE: `+` then 1-2 digits, -, 3 digits, -, 4 digits (greedy
      // {1,2}: two digits first, then one).
      if (matched == 0 && b == '+') {
        var dg = i + 1
        while (dg < len && dg <= i + 2 && isDigit(src(dg))) dg += 1
        // Greedy {1,2}: hyphen tried after 2 consumed digits first,
        // then after 1 (h1 walks dg → i+2; no digits → loop is empty).
        var e = -1
        var h1 = dg
        while (e < 0 && h1 >= i + 2) {
          if (h1 + 9 <= len && src(h1) == '-' &&
              isDigit(src(h1 + 1)) && isDigit(src(h1 + 2)) &&
              isDigit(src(h1 + 3)) && src(h1 + 4) == '-' &&
              isDigit(src(h1 + 5)) && isDigit(src(h1 + 6)) &&
              isDigit(src(h1 + 7)) && isDigit(src(h1 + 8)))
            e = h1 + 9
          else h1 -= 1
        }
        if (e > 0) { out.write(PHONE_TOK); nPhone += 1; matched = e }
      }
      // SSN: 3 digits, -, 2 digits, -, 4 digits.
      if (matched == 0 && isDigit(b) && i + 11 <= len &&
          isDigit(src(i + 1)) && isDigit(src(i + 2)) &&
          src(i + 3) == '-' &&
          isDigit(src(i + 4)) && isDigit(src(i + 5)) &&
          src(i + 6) == '-' &&
          isDigit(src(i + 7)) && isDigit(src(i + 8)) &&
          isDigit(src(i + 9)) && isDigit(src(i + 10))) {
        out.write(ID_TOK); nId += 1; matched = i + 11
      }
      if (matched > 0) i = matched
      else { out.write(b.toInt); i += 1 }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(out.toByteArray), nEmail, nPhone, nId))
  }

  private val EMAIL_TOK = "<EMAIL>".getBytes
  private val PHONE_TOK = "<PHONE>".getBytes
  private val ID_TOK = "<ID>".getBytes

  /** Per-document token frequencies in one pass: one (token, tf) pair
    * per DISTINCT token (split-on-0x20 semantics, empty tokens
    * included — matching `split`/`string_split` to the row), first-seen
    * order. Dedup is EXACT — the [[tokenStats]] open-addressing probe
    * with byte comparison on hash equality, extended with a count per
    * slot — so the pairs equal `explode(split) → groupBy(token)` to the
    * last row. Emitting pre-aggregated pairs makes the per-document tf
    * aggregate free of shuffle at ANY scale: it never leaves the input
    * row, and downstream consumers explode ~distinct-pairs rows instead
    * of raw token occurrences. */
  def tokenTf(s: UTF8String): ArrayData = {
    val st = tokenStarts(s)
    val n = st.length - 1
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var cap = 8
    while (cap < n * 2) cap <<= 1
    val slot = new Array[Int](cap)
    java.util.Arrays.fill(slot, -1)
    val hs = new Array[Long](cap)
    val cnt = new Array[Int](cap)
    val order = new Array[Int](n)
    var types = 0
    var i = 0
    while (i < n) {
      val ts = st(i)
      val tl = st(i + 1) - 1 - ts
      val h = XXH64.hashUnsafeBytes(base, off + ts, tl, 42L)
      var p = (h & (cap - 1)).toInt
      var done = false
      while (!done) {
        val o = slot(p)
        if (o < 0) {
          slot(p) = i; hs(p) = h; cnt(p) = 1; order(types) = p; types += 1
          done = true
        } else if (hs(p) == h && {
          val os = st(o)
          st(o + 1) - 1 - os == tl &&
            ByteArrayMethods.arrayEquals(base, off + ts, base, off + os, tl)
        }) { cnt(p) += 1; done = true }
        else p = (p + 1) & (cap - 1)
      }
      i += 1
    }
    val out = new Array[Any](types)
    var t = 0
    while (t < types) {
      val p = order(t)
      val o = slot(p)
      val ts = st(o)
      val tl = st(o + 1) - 1 - ts
      val b = new Array[Byte](tl)
      Platform.copyMemory(base, off + ts, b, Platform.BYTE_ARRAY_OFFSET, tl)
      out(t) = new GenericInternalRow(
        Array[Any](UTF8String.fromBytes(b), cnt(p)))
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document word-k-gram frequencies as HASHED pairs, one fused
    * byte pass: for each distinct k-gram, `(h, hp, tf)` where `h` is
    * `xxhash64` of the gram's byte span (seed 42 — equal to the SQL
    * `xxhash64(gram_string)` a `split`-based plan would compute), `hp`
    * the hash of its first k-1 tokens (the conditioning prefix an
    * n-gram language model joins on), and `tf` the within-document
    * count. Emitting hashes instead of gram strings means NO string
    * ever reaches an exchange: the n-gram-LM aggregate shuffles
    * 20-byte rows whatever the gram length — the same
    * hash-keyed-exchange idiom as the tf-idf rewrite.
    *
    * Dedup is BY HASH (unlike [[tokenStats]], no byte-compare rescue):
    * downstream consumers group by `h` across documents, so two
    * colliding grams merge there regardless — resolving them locally
    * would buy nothing. Expected merged pairs at n distinct grams are
    * n²/2⁶⁵ (≈ 3 at n = 10¹⁰, i.e. 100 TB corpus scale — harmless for
    * a quality score; zero at any verify scale). */
  def gramTfHashes(s: UTF8String, k: Int): ArrayData = {
    val st = tokenStarts(s)
    val n = st.length - 1
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var cap = 8
    while (cap < m * 2) cap <<= 1
    val slot = new Array[Int](cap) // first gram index, or -1
    java.util.Arrays.fill(slot, -1)
    val hs = new Array[Long](cap)
    val cnt = new Array[Int](cap)
    val order = new Array[Int](m)
    var types = 0
    var i = 0
    while (i < m) {
      val ts = st(i)
      val gl = st(i + k) - 1 - ts
      val h = XXH64.hashUnsafeBytes(base, off + ts, gl, 42L)
      var p = (h & (cap - 1)).toInt
      var done = false
      while (!done) {
        if (slot(p) < 0) {
          slot(p) = i; hs(p) = h; cnt(p) = 1; order(types) = p; types += 1
          done = true
        } else if (hs(p) == h) { cnt(p) += 1; done = true }
        else p = (p + 1) & (cap - 1)
      }
      i += 1
    }
    val out = new Array[Any](types)
    var t = 0
    while (t < types) {
      val p = order(t)
      val o = slot(p)
      val ts = st(o)
      val pl = st(o + k - 1) - 1 - ts // first k-1 tokens
      val hp = XXH64.hashUnsafeBytes(base, off + ts, pl, 42L)
      out(t) = new GenericInternalRow(Array[Any](hs(p), hp, cnt(p)))
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Fused `split` + [[ShingleKernel.hashes3]]: distinct sorted 64-bit
    * hashes of the word-3-gram shingles, hashed straight off the value
    * buffer (chained XXH64, seed 42 — identical to the array kernel).
    * Empty result when the document has fewer than three tokens, which
    * lets callers replace `filter(size(split) >= 3)` with
    * `filter(size(sha) >= 1)` — same surviving rows, no split. */
  def shingle3(s: UTF8String): ArrayData = shingleK(s, 3)

  /** Generalized word-k-gram form of [[shingle3]]: distinct sorted
    * chained-XXH64 hashes of every k consecutive tokens. The chain is
    * injective over word boundaries (tokens contain no separator), so
    * distinct-hash arithmetic — overlap counts, document frequencies —
    * equals the same arithmetic on the concatenated string k-grams an
    * ANSI oracle computes (modulo the 2^-64 collision rate). k = 8 is
    * the standard benchmark-decontamination window, k = 5 the
    * boilerplate-phrase window. */
  def shingleK(s: UTF8String, k: Int): ArrayData = {
    val st = tokenStarts(s)
    val n = st.length - 1
    val m = n - k + 1
    if (m <= 0) {
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    }
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 42L
      var j = 0
      while (j < k) {
        val ts = st(i + j)
        h = XXH64.hashUnsafeBytes(base, off + ts, st(i + j + 1) - 1 - ts, h)
        j += 1
      }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, w))
  }

  /** ALL word-k-gram strings of `s` (non-distinct, in document order) as
    * zero-decode byte slices. Because the separator is the single byte
    * 0x20, the composed gram `concat(tk[i], ' ', …, ' ', tk[i+k-1])` is
    * EXACTLY the contiguous byte range [st(i), st(i+k)−1) of the
    * original buffer — including every empty-token / consecutive-space
    * shape — so one `copyMemory` per gram replaces the composed plan's
    * split → sequence → transform → per-gram concat chain (a token
    * array, a lambda frame, and two UTF8String allocations per gram).
    * Empty result below k tokens, so `explode` drops exactly the rows
    * `filter(size(split) >= k)` would. Feeds the exact heavy-hitter
    * aggregate, whose oracle groups the identical strings. */
  def gramSlices(s: UTF8String, k: Int): ArrayData = {
    val st = tokenStarts(s)
    val n = st.length - 1
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val ts = st(i)
      val len = st(i + k) - 1 - ts
      val b = new Array[Byte](len)
      Platform.copyMemory(base, off + ts, b, Platform.BYTE_ARRAY_OFFSET, len)
      out(i) = UTF8String.fromBytes(b)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused `split` + [[SimHashKernel.compute]]: per-token ±1 votes on the
    * 64 signature bits, tokens hashed in place (seed 42 = `xxhash64`'s
    * default, same as the array kernel). */
  def simhash(s: UTF8String): Long = {
    val st = tokenStarts(s)
    val n = st.length - 1
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val ts = st(i)
      val h = XXH64.hashUnsafeBytes(base, off + ts, st(i + 1) - 1 - ts, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** murmur3 fmix64 finalizer — decorrelates hashes before the
    * commutative sum in [[tokenSetHash]] (a raw-xxh64 sum would let
    * related token sets cancel structurally; after a full-avalanche
    * mix the sum behaves like a random 64-bit function of the set). */
  private def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Order/duplication-insensitive 64-bit CONTENT fingerprint of `s`:
    * the wrapping sum of fmix64-finalized token hashes over the
    * document's DISTINCT tokens. Semantically the grouping key
    * `md5(array_join(array_sort(array_distinct(split(text, ' '))), ' '))`
    * — equal token SETS ⟺ equal fingerprints (2⁻⁶⁴ collisions aside,
    * the md5 key's own collision class) — at a fraction of the cost:
    * one byte pass, no token-array materialization, no sort, no string
    * digest. Distinctness is EXACT ([[tokenStats]]' byte-compare
    * probe); the commutative sum replaces the sort entirely. Intended
    * as a GROUPING key only (dup-audit operators group on it and emit
    * per-group aggregates), so cross-engine parity is at the aggregate
    * level: both engines compute the same partition of documents. */
  def tokenSetHash(s: UTF8String): Long = {
    val st = tokenStarts(s)
    val n = st.length - 1
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var cap = 8
    while (cap < n * 2) cap <<= 1
    val slot = new Array[Int](cap)
    java.util.Arrays.fill(slot, -1)
    val hs = new Array[Long](cap)
    var acc = 0L
    var i = 0
    while (i < n) {
      val ts = st(i)
      val tl = st(i + 1) - 1 - ts
      val h = XXH64.hashUnsafeBytes(base, off + ts, tl, 42L)
      var p = (h & (cap - 1)).toInt
      var done = false
      while (!done) {
        val o = slot(p)
        if (o < 0) { slot(p) = i; hs(p) = h; acc += fmix64(h); done = true }
        else if (hs(p) == h && {
          val os = st(o)
          st(o + 1) - 1 - os == tl &&
            ByteArrayMethods.arrayEquals(base, off + ts, base, off + os, tl)
        }) done = true
        else p = (p + 1) & (cap - 1)
      }
      i += 1
    }
    acc
  }

  /** (n_bpe_tokens, n_bpe_types) of the BPE-ish segmentation
    * `[a-z]+|[0-9]+|[^a-z0-9\s]` over the LOWERCASED text, one fused
    * pass — the regex-free form of
    * `regexp_extract_all(lower(text), …)` + `array_distinct` (two
    * java.util.regex passes plus a token-array materialization per
    * row; measured the dominant cost of the tokenizer-pricing row).
    * Segmentation: maximal ASCII-letter runs (A-Z folded in place),
    * maximal ASCII-digit runs, every other non-whitespace CHARACTER
    * (code point, multi-byte included) as a single token — SIMPLE-
    * case-folded (Character.toLowerCase per code point) before
    * hashing, so 'É'/'é' are one type like the regex contract; the
    * FULL-mapping cases (String.toLowerCase expansions like 'İ' →
    * "i"+U+0307, or fold-to-ASCII letters like Kelvin 'K' → 'k' that
    * the regex would re-classify into a letter run) remain single
    * OTHER tokens here, a documented and spec-pinned divergence;
    * whitespace
    * = the regex `\s` class (space, \t, \n, \x0B, \f, \r — identical
    * in Java and RE2 for these code points). Distinctness is BY HASH
    * (rolling fold + fmix64, the [[gramTfHashes]] precedent): a 2⁻⁶⁴
    * collision under-counts types by one, far below the row's
    * verification resolution. */
  def bpeStats(s: UTF8String): InternalRow = {
    val cs = charStarts(s)
    val n = cs.length - 1
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var cap = 16
    while (cap < n * 2) cap <<= 1 // tokens <= chars => load factor <= 0.5
    val set = new Array[Long](cap)
    var types = 0
    var count = 0
    def add(h0: Long): Unit = {
      val h = fmix64(if (h0 == 0L) 0x27d4eb2f165667c5L else h0)
      count += 1
      var p = (h & (cap - 1)).toInt
      while (set(p) != 0L && set(p) != h) p = (p + 1) & (cap - 1)
      if (set(p) == 0L) { set(p) = h; types += 1 }
    }
    var runClass = 0 // 0 none, 1 letters, 2 digits
    var runHash = 0L
    var i = 0
    while (i < n) {
      val st = cs(i)
      val len = cs(i + 1) - st
      val b = Platform.getByte(base, off + st)
      val cls =
        if (len > 1) 3 // non-ASCII code point → OTHER
        else if (b >= 'a' && b <= 'z' || b >= 'A' && b <= 'Z') 1
        else if (b >= '0' && b <= '9') 2
        else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
          b == '\f' || b == '\r') -1
        else 3
      if (cls != runClass && runClass != 0) { add(runHash); runClass = 0 }
      cls match {
        case 1 =>
          val fb = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          runHash = (if (runClass == 1) runHash else 0x61c8864680b583ebL) *
            RollB + ByteMix(fb & 0xFF)
          runClass = 1
        case 2 =>
          runHash = (if (runClass == 2) runHash else 0x3c6ef372fe94f82aL) *
            RollB + ByteMix(b & 0xFF)
          runClass = 2
        case 3 =>
          // Decode the code point and SIMPLE-case-fold it
          // (Character.toLowerCase on the code point) before hashing,
          // so 'É' and 'é' are one type — matching
          // `regexp_extract_all(lower(text), …)` for the 1:1-mapping
          // majority. Documented divergence: full-mapping characters
          // ('İ' → "i"+U+0307 under String.toLowerCase) and fold-to-
          // ASCII letters ('K' → 'k') stay single OTHER tokens here,
          // where the regex would re-classify them into letter runs;
          // pinned in TextKernelsSpec.
          var cp = Platform.getByte(base, off + st) & 0xFF
          if (len > 1) {
            cp = cp & (0x3F >> (len - 1))
            var j = st + 1
            while (j < st + len) {
              cp = (cp << 6) | (Platform.getByte(base, off + j) & 0x3F)
              j += 1
            }
          }
          val lc = Character.toLowerCase(cp)
          var h = 0x1f83d9abfb41bd6bL
          if (lc < 0x80) h = h * RollB + ByteMix(lc)
          else if (lc < 0x800) {
            h = h * RollB + ByteMix(0xC0 | (lc >> 6))
            h = h * RollB + ByteMix(0x80 | (lc & 0x3F))
          } else if (lc < 0x10000) {
            h = h * RollB + ByteMix(0xE0 | (lc >> 12))
            h = h * RollB + ByteMix(0x80 | ((lc >> 6) & 0x3F))
            h = h * RollB + ByteMix(0x80 | (lc & 0x3F))
          } else {
            h = h * RollB + ByteMix(0xF0 | (lc >> 18))
            h = h * RollB + ByteMix(0x80 | ((lc >> 12) & 0x3F))
            h = h * RollB + ByteMix(0x80 | ((lc >> 6) & 0x3F))
            h = h * RollB + ByteMix(0x80 | (lc & 0x3F))
          }
          add(h)
        case _ => // whitespace: no token
      }
      i += 1
    }
    if (runClass != 0) add(runHash)
    new GenericInternalRow(Array[Any](count, types))
  }

  /** Byte offsets of CHARACTER starts in `s` (UTF-8 lead bytes), plus a
    * numBytes sentinel — so character i spans bytes [cs(i), cs(i+1)).
    * Character positions (not byte positions) are the contract the
    * span-dedup oracle can express: DuckDB/Spark `substring` both count
    * characters, so parity holds on any input, not just ASCII. */
  private def charStarts(s: UTF8String): Array[Int] = {
    val n = s.numChars()
    val cs = new Array[Int](n + 1)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    var c = 0
    while (c < n) {
      cs(c) = i
      i += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + i))
      c += 1
    }
    cs(n) = s.numBytes
    cs
  }

  /** All gram hashes of `s` under a k-CHARACTER sliding window, stride
    * 1: hashes(i) = xxhash64 of the UTF-8 bytes of characters
    * [i, i+k). Shared by [[gramPosHashes]] and [[winnowPosHashes]]. */
  private def slideHashes(s: UTF8String, k: Int): Array[Long] = {
    val cs = charStarts(s)
    val n = cs.length - 1
    val m = n - k + 1
    if (m <= 0) return Array.emptyLongArray
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = XXH64.hashUnsafeBytes(base, off + cs(i), cs(i + k) - cs(i), 42L)
      i += 1
    }
    hs
  }

  /** Per-byte random table + polynomial base for the ROLLING gram
    * hash: [[slideHashes]] re-hashes the full k-byte window at every
    * position — k× the text volume in hash work, the dominant CPU of
    * any long-gram consumer. The rolling form pays O(1) per position:
    * per-character values v(j) (a splitmix-tabled byte fold, one pass),
    * then H(i) = Σ B^(k-1-j)·v(i+j) over Z/2⁶⁴ with the standard
    * Rabin-Karp update. Equality-proxy quality is the polynomial-hash
    * standard (≈2⁻⁶⁴ for non-adversarial text — the same collision
    * class every gram consumer here already accepts); NOT aligned with
    * xxhash64, so only consumers comparing within ONE hash universe
    * may use it. */
  private val ByteMix: Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      t(i) = fmix64(0x9E3779B97F4A7C15L * (i + 1L)); i += 1
    }
    t
  }
  private val RollB = 0x9E3779B97F4A7C15L // odd → invertible mod 2^64

  /** DISTINCT k-character-gram hashes of `s`, sorted — the positionless
    * set form of [[gramPosHashes]] (one fused pass, in-row dedup): when
    * a consumer only needs WHICH grams a document contains (pair
    * generation, containment checks), emitting the distinct set removes
    * the corpus-sized distinct exchange a `explode → distinct` plan
    * pays, and the ROLLING hash (doc above) removes the k× hashing
    * cost. Own hash universe — do not intersect with xxhash-based
    * kernels. */
  def gramSetHashes(s: UTF8String, k: Int): ArrayData = {
    val cs = charStarts(s)
    val n = cs.length - 1
    val m = n - k + 1
    if (m <= 0)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // Per-character values: tabled byte fold (one pass over the text).
    val v = new Array[Long](n)
    var j = 0
    while (j < n) {
      var acc = 0L
      var b = cs(j)
      while (b < cs(j + 1)) {
        acc = acc * 31L + ByteMix(Platform.getByte(base, off + b) & 0xFF)
        b += 1
      }
      v(j) = acc
      j += 1
    }
    var bk = 1L // B^(k-1)
    var e = 0
    while (e < k - 1) { bk *= RollB; e += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    j = 0
    while (j < k) { h = h * RollB + v(j); j += 1 }
    hs(0) = fmix64(h)
    var i = 1
    while (i < m) {
      h = (h - bk * v(i - 1)) * RollB + v(i + k - 1)
      hs(i) = fmix64(h)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }

  /** `gram_pos_hashes(text, k)`: the hash of EVERY k-character window
    * of `s` with its 1-based character start position — the positional
    * gram table of exact substring-span dedup (Lee et al. 2021 detect
    * duplicated spans via suffix arrays; positional k-grams are the
    * shuffle-friendly equivalent: every duplicated span of length >= k
    * contains an identical k-gram at every start offset, so grouping on
    * the hash finds exactly the spans' gram cover). One fused byte
    * pass; empty below k characters. */
  def gramPosHashes(s: UTF8String, k: Int): ArrayData = {
    val hs = slideHashes(s, k)
    val out = new Array[Any](hs.length)
    var i = 0
    while (i < hs.length) {
      out(i) = new GenericInternalRow(Array[Any](hs(i), i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `winnow_pos_hashes(text, k, w)`: robust winnowing (Schleimer,
    * Wilkerson & Aiken, SIGMOD'03 — the MOSS fingerprinting scheme)
    * over the k-character gram hash sequence: from every window of `w`
    * consecutive gram hashes select the minimum (rightmost occurrence
    * on ties), recording each selected (hash, 1-based char pos) once.
    *
    * Guarantee (the paper's Theorem 1 shape): any substring shared by
    * two documents of length >= w + k - 1 characters contributes >= w
    * consecutive equal gram hashes to both, some window falls entirely
    * inside the run in each, and the same minimum is selected — the
    * fingerprint SETS intersect. Expected density is 2/(w+1), so the
    * exploded table shrinks ~(w+1)/2 x vs [[gramPosHashes]] — the
    * 100 TB path for span-level dedup, where the exact table's
    * ~20 bytes/character shuffle is the binding cost.
    *
    * Monotonic-deque implementation: O(m) total, pops on `>=` so a
    * later equal minimum evicts an earlier one (rightmost tie-break —
    * required for the position-robustness property the paper names the
    * scheme after). */
  def winnowPosHashes(s: UTF8String, k: Int, w: Int): ArrayData = {
    val hs = slideHashes(s, k)
    val m = hs.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val win = math.min(w, m)
    val deque = new Array[Int](m) // indices, hashes strictly increasing
    var head = 0
    var tail = 0 // exclusive
    val sel = new Array[Int](m)
    var nSel = 0
    var last = -1
    var i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1 && deque(head) != last) {
        last = deque(head)
        sel(nSel) = last; nSel += 1
      }
      i += 1
    }
    val out = new Array[Any](nSel)
    i = 0
    while (i < nSel) {
      out(i) = new GenericInternalRow(Array[Any](hs(sel(i)), sel(i) + 1))
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait StringKernelExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.sql}")
  }
}

/** `token_stats(text)` → struct<n_tokens:int, n_types:int>. */
case class TokenStats(child: Expression) extends StringKernelExpression {

  override def dataType: DataType = TokenStats.schema

  override def prettyName: String = "token_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.tokenStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernel.tokenStats($a)")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_types", IntegerType, nullable = false)))
}

/** `shingle3_hashes_text(text)` → array<long> (fused split + shingle). */
case class ShingleHashes3Text(child: Expression) extends StringKernelExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle3_hashes_text"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.shingle3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernel.shingle3($a)")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes3Text = copy(child = newChild)
}

/** `shinglek_hashes_text(text, k)` → array<long>: distinct hashes of the
  * word-k-gram shingles, k a foldable literal (fixed per plan, so the
  * generated code inlines it). */
case class ShingleHashesKText(child: Expression, k: Int)
    extends StringKernelExpression {
  require(k >= 1, s"shingle window must be >= 1, got $k")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shinglek_hashes_text"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.shingleK(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextKernel.shingleK($a, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashesKText = copy(child = newChild)
}

/** `gram_slices_text(text, k)` → array<string>: all word-k-gram strings
  * as zero-decode byte slices, k a foldable literal. */
case class GramSlicesText(child: Expression, k: Int)
    extends StringKernelExpression {
  require(k >= 1, s"gram window must be >= 1, got $k")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "gram_slices_text"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.gramSlices(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextKernel.gramSlices($a, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): GramSlicesText = copy(child = newChild)
}

/** `gram_pos_hashes(text, k)` → array<struct<h:bigint, pos:int>>: hash
  * of every k-character window with its 1-based character position —
  * the positional-gram table of exact span-level dedup. */
case class GramPosHashes(child: Expression, k: Int)
    extends StringKernelExpression {
  require(k >= 1, s"gram window must be >= 1, got $k")

  override def dataType: DataType = GramPosHashes.schema

  override def prettyName: String = "gram_pos_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.gramPosHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextKernel.gramPosHashes($a, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): GramPosHashes = copy(child = newChild)
}

object GramPosHashes {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
}

/** `gram_set_hashes(text, k)` → array<long>: sorted DISTINCT
  * k-character-gram hashes ([[TextKernel.gramSetHashes]]). */
case class GramSetHashes(child: Expression, k: Int)
    extends StringKernelExpression {
  require(k >= 1, s"gram window must be >= 1, got $k")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "gram_set_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.gramSetHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextKernel.gramSetHashes($a, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): GramSetHashes = copy(child = newChild)
}

/** `winnow_pos_hashes(text, k, w)` → array<struct<h:bigint, pos:int>>:
  * robust-winnowed fingerprints (window w over the k-char gram hashes). */
case class WinnowPosHashes(child: Expression, k: Int, w: Int)
    extends StringKernelExpression {
  require(k >= 1 && w >= 1, s"window sizes must be >= 1, got k=$k w=$w")

  override def dataType: DataType = GramPosHashes.schema

  override def prettyName: String = "winnow_pos_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.winnowPosHashes(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextKernel.winnowPosHashes($a, $k, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowPosHashes = copy(child = newChild)
}

/** `token_tf_pairs(text)` → array<struct<token:string, tf:int>>:
  * per-document token frequencies, one fused byte pass. */
case class TokenTfPairs(child: Expression) extends StringKernelExpression {

  override def dataType: DataType = TokenTfPairs.schema

  override def prettyName: String = "token_tf_pairs"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.tokenTf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernel.tokenTf($a)")

  override protected def withNewChildInternal(
      newChild: Expression): TokenTfPairs = copy(child = newChild)
}

object TokenTfPairs {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false))), containsNull = false)
}

/** `gram_tf_hashes(text, k)` → array<struct<h:bigint, hp:bigint,
  * tf:int>>: per-document hashed word-k-gram frequencies with the
  * conditioning-prefix hash ([[TextKernel.gramTfHashes]]). */
case class GramTfHashes(child: Expression, k: Int)
    extends StringKernelExpression {
  require(k >= 2, s"gram_tf_hashes needs k >= 2 (a k-gram with a " +
    s"non-empty conditioning prefix), got $k")

  override def dataType: DataType = GramTfHashes.schema

  override def prettyName: String = "gram_tf_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.gramTfHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextKernel.gramTfHashes($a, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): GramTfHashes = copy(child = newChild)
}

object GramTfHashes {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("hp", LongType, nullable = false),
    StructField("tf", IntegerType, nullable = false))),
    containsNull = false)
}

/** `simhash64_text(text)` → long (fused split + simhash). */
case class SimHash64Text(child: Expression) extends StringKernelExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64_text"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernel.simhash($a)")

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64Text = copy(child = newChild)
}

/** `bpe_stats(text)` → struct<n_bpe:int, n_types:int>
  * ([[TextKernel.bpeStats]] — the fused BPE-ish segmentation counts). */
case class BpeStats(child: Expression) extends StringKernelExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bpe", IntegerType, nullable = false),
    StructField("n_types", IntegerType, nullable = false)))

  override def prettyName: String = "bpe_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.bpeStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernel.bpeStats($a)")

  override protected def withNewChildInternal(
      newChild: Expression): BpeStats = copy(child = newChild)
}

/** `token_set_hash(text)` → long: order/duplication-insensitive content
  * fingerprint ([[TextKernel.tokenSetHash]] — the fused grouping-key
  * replacement for md5-of-sorted-distinct-tokens). */
case class TokenSetHash(child: Expression) extends StringKernelExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "token_set_hash"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.tokenSetHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernel.tokenSetHash($a)")

  override protected def withNewChildInternal(
      newChild: Expression): TokenSetHash = copy(child = newChild)
}

/** `word_counts(text, 'w1,w2,…')` → array<long>: occurrence count of
  * each listed word among the split-on-0x20 tokens, one fused byte
  * pass ([[TextKernel.wordCounts]] — the lang-ID marker scorer). */
case class WordCounts(child: Expression, words: String)
    extends StringKernelExpression {
  require(words.nonEmpty, "word_counts needs a non-empty word list")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "word_counts"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.wordCounts(input.asInstanceOf[UTF8String], words)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("words", words, "java.lang.String")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextKernel.wordCounts($a, $w)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordCounts = copy(child = newChild)
}

/** `pii_redact(text)` → struct<redacted:string, n_email:bigint,
  * n_phone:bigint, n_id:bigint>: the one-pass anchored scanner form of
  * the email/phone/SSN `regexp_replace` triple
  * ([[TextKernel.piiRedact]]). */
case class PiiRedact(child: Expression) extends StringKernelExpression {

  override def dataType: DataType = PiiRedact.schema

  override def prettyName: String = "pii_redact"

  override protected def nullSafeEval(input: Any): Any =
    TextKernel.piiRedact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernel.piiRedact($a)")

  override protected def withNewChildInternal(
      newChild: Expression): PiiRedact = copy(child = newChild)
}

object PiiRedact {
  val schema: StructType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_email", LongType, nullable = false),
    StructField("n_phone", LongType, nullable = false),
    StructField("n_id", LongType, nullable = false)))
}

/** Column-API entry points (mirrors [[VectorFunctions]]' registry style). */
object TextFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_stats", exprs => TokenStats(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle3_hashes_text", exprs => ShingleHashes3Text(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64_text", exprs => SimHash64Text(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_tf_pairs", exprs => TokenTfPairs(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_set_hash", exprs => TokenSetHash(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_stats", exprs => BpeStats(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pii_redact", exprs => PiiRedact(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_counts", exprs => {
        val w = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
              v: UTF8String, StringType) => v.toString
          case other => throw new IllegalArgumentException(
            s"word_counts expects a literal word list, got $other")
        }
        WordCounts(exprs.head, w)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shinglek_hashes_text", exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"shinglek_hashes_text expects a literal int window, got $other")
        }
        ShingleHashesKText(exprs.head, k)
      }, "built-in")
    def litInt(e: Expression, fn: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn expects a literal int window, got $other")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_pos_hashes", exprs =>
        GramPosHashes(exprs.head, litInt(exprs(1), "gram_pos_hashes")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_set_hashes", exprs =>
        GramSetHashes(exprs.head, litInt(exprs(1), "gram_set_hashes")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_pos_hashes", exprs =>
        WinnowPosHashes(exprs.head, litInt(exprs(1), "winnow_pos_hashes"),
          litInt(exprs(2), "winnow_pos_hashes")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_tf_hashes", exprs =>
        GramTfHashes(exprs.head, litInt(exprs(1), "gram_tf_hashes")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_slices_text", exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"gram_slices_text expects a literal int window, got $other")
        }
        GramSlicesText(exprs.head, k)
      }, "built-in")
  }

  /** struct(n_tokens, n_types) of `text` in one fused byte pass. */
  def tokenStats(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("token_stats", text)
  }

  /** Distinct hashed word-3-gram shingles of `text`, fused split+hash. */
  def shingle3Text(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("shingle3_hashes_text", text)
  }

  /** Per-document (token, tf) pairs of `text`, one fused byte pass. */
  def tokenTfPairs(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("token_tf_pairs", text)
  }

  /** One-pass 64-bit simhash of `text`, fused split+vote. */
  def simhashText(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("simhash64_text", text)
  }

  /** Order/duplication-insensitive 64-bit content fingerprint of
    * `text` — the fused grouping-key form of md5-of-sorted-distinct-
    * tokens (one byte pass, no sort, no string digest). */
  def tokenSetHash(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("token_set_hash", text)
  }

  /** struct(n_bpe, n_types) of the BPE-ish segmentation, one fused
    * pass (regex-free `regexp_extract_all(lower(text), …)` counts). */
  def bpeStats(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("bpe_stats", text)
  }

  /** struct(redacted, n_email, n_phone, n_id) — one-pass anchored
    * email/phone/SSN redaction of `text`. */
  def piiRedact(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("pii_redact", text)
  }

  /** Occurrence counts of the listed words among the tokens of `text`
    * in one fused byte pass, aligned with the list order. */
  def wordCounts(spark: SparkSession, text: Column,
      words: Seq[String]): Column = {
    register(spark)
    call_function("word_counts", text, lit(words.mkString(",")))
  }

  /** Distinct hashed word-k-gram shingles of `text` (k fixed per plan). */
  def shingleKText(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    call_function("shinglek_hashes_text", text, lit(k))
  }

  /** (hash, 1-based char pos) of every k-character window of `text`. */
  def gramPosHashes(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    call_function("gram_pos_hashes", text, lit(k))
  }

  /** Sorted DISTINCT k-character-gram hashes of `text` (set form). */
  def gramSetHashes(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    call_function("gram_set_hashes", text, lit(k))
  }

  /** Robust-winnowed (hash, pos) fingerprints of `text`. */
  def winnowPosHashes(spark: SparkSession, text: Column, k: Int,
      w: Int): Column = {
    register(spark)
    call_function("winnow_pos_hashes", text, lit(k), lit(w))
  }

  /** All word-k-gram strings of `text` (non-distinct, document order),
    * one fused byte pass. */
  def gramSlicesText(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    call_function("gram_slices_text", text, lit(k))
  }

  /** Per-document hashed (gram, prefix, tf) triples of the word
    * k-grams of `text`, one fused byte pass — the n-gram-LM feed. */
  def gramTfHashes(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    call_function("gram_tf_hashes", text, lit(k))
  }
}
