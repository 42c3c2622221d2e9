package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind the native expressions — the single source of
  * truth called by BOTH evaluation paths: `nullSafeEval` (interpreted)
  * and the generated code from `doGenCode` (a top-level object compiles
  * to a mirror class with static forwarders, so generated Java calls
  * `ExprKernels.tokenize(...)` directly).
  *
  * Keeping the expressions codegen-capable matters beyond the call
  * itself: one `CodegenFallback` expression forces the WHOLE enclosing
  * projection out of whole-stage codegen, deoptimizing every other
  * column in the stage.
  */
object ExprKernels {

  /** Lowercase + maximal-[a-z0-9]-run scan (see Tokenize). */
  def tokenize(input: UTF8String): ArrayData = {
    val s = input.toLowerCase.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var j = i + 1
        while (j < n && {
          val d = s.charAt(j)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) j += 1
        out += UTF8String.fromString(s.substring(i, j))
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Composable rolling-hash n-gram fingerprints (see ShingleHashes). */
  def shingleHashes(arr: ArrayData, arity: Int): ArrayData = {
    val P = RollingHash.P
    val n = arr.numElements()
    if (n < arity) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](n)
    val pow = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var acc = 0L
      var p = 1L
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        acc = (acc * 31 + cp) % P
        p = (p * 31) % P
        j += Character.charCount(cp)
      }
      h(i) = acc
      pow(i) = p
      i += 1
    }
    val out = new Array[Long](n - arity + 1)
    i = 0
    while (i < n - arity + 1) {
      var acc = h(i)
      var k = i + 1
      while (k < i + arity) {
        val withSpace = (acc * 31 + 32) % P // ' ' == 32
        acc = (withSpace * pow(k) + h(k)) % P
        k += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** (a·f+b) mod p minima per hash function (see MinHashSignature). */
  def minhash(fps: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val k = a.length
    val n = fps.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val f = fps.getLong(i)
      var j = 0
      while (j < k) {
        val h = (a(j) * f + b(j)) % p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 32-bit term-frequency bit-balance simhash (see SimHash32). */
  def simhash32(ths: ArrayData): Long = {
    val n = ths.numElements()
    val balance = new Array[Long](32)
    var i = 0
    while (i < n) {
      val h = ths.getLong(i)
      var j = 0
      while (j < 32) {
        balance(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (balance(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def rollingHash(s: UTF8String): Long = RollingHash.hash(s.toString)

  def tokenHashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = RollingHash.hash(arr.getUTF8String(i).toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Count of array elements contained in a small string set (see
    * TokensInSet) — `size(filter(t, x -> x IN (…)))` as one pass over the
    * UTF8String array against a hash set, no per-element lambda frames.
    */
  def tokensInSet(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  /** Per-bucket occurrence counts of a non-negative long array under
    * `x % m` (see BucketCounts) — one traversal into an m-long counts
    * array, the DSIR scorer's bag-of-hashed-ngrams vector without 64
    * filter passes or an explode+shuffle.
    *
    * The non-negative contract is ENFORCED, not assumed: `bucket_counts`
    * is a registered public SQL function, and a negative key under Java
    * `%` would either corrupt an index or surface as an opaque
    * ArrayIndexOutOfBoundsException deep in an executor task. Silently
    * floorMod-ing instead would diverge from the `x % m` semantics every
    * SQL consumer (and the DuckDB oracle) computes — so fail loudly with
    * the offending value, the softmax label-domain discipline.
    */
  def bucketCounts(keys: ArrayData, m: Int): ArrayData = {
    val out = new Array[Long](m)
    val n = keys.numElements()
    var i = 0
    while (i < n) {
      val k = keys.getLong(i)
      if (k < 0L) throw new IllegalArgumentException(
        s"bucket_counts: key $k is negative — keys must be non-negative " +
          s"(Java % would disagree with SQL's x % $m bucketing)")
      out((k % m).toInt) += 1
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Intra-document repetition statistics over an n-gram fingerprint
    * array (see DupRunStats): `[top, dup]` where `top` is the highest
    * multiplicity of any single fingerprint and `dup` the number of
    * occurrences belonging to fingerprints that appear ≥ 2 times. One
    * sort + one run-length pass per row (O(n log n) in the DOCUMENT's
    * gram count — map-only, no explode, no per-doc shuffle), vs the
    * compose form's O(n²) nested filter lambdas. Empty input → [0, 0].
    */
  def dupRunStats(fps: ArrayData): ArrayData = {
    val n = fps.numElements()
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = fps.getLong(i); i += 1 }
    java.util.Arrays.sort(a)
    var top = 0L
    var dup = 0L
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && a(j) == a(i)) j += 1
      val run = (j - i).toLong
      if (run > top) top = run
      if (run >= 2L) dup += run
      i = j
    }
    new GenericArrayData(Array(top, dup))
  }

  /** Per-row term-frequency rollup over a string array: sorted-distinct
    * (term, count) struct rows by one sort + run-length pass (see
    * TermRunCounts). Exploded downstream, this IS
    * `explode(terms) → groupBy(doc_id, term) → count` computed inside
    * the row — the (doc_id, term) exchange disappears from the plan.
    */
  def termRunCounts(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val a = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      a(i) = arr.getUTF8String(i)
      if (a(i) eq null) throw new IllegalArgumentException(
        "term_run_counts: input array contains a null element — terms " +
          "must be non-null (the aggregate twin groupBy(term) it replaces " +
          "would key a null group; no call site produces one)")
      i += 1
    }
    java.util.Arrays.sort(a) // UTF8String is Comparable (binary order)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && a(j) == a(i)) j += 1
      out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](a(i).asInstanceOf[UTF8String].clone(), (j - i).toLong))
      i = j
    }
    new GenericArrayData(out.toArray)
  }

  /** Per-row token statistics `[n, k, top]` — total tokens, distinct
    * tokens, highest single-token multiplicity — by the same sort +
    * run-length pass as [[termRunCounts]] (see TokenStats; q47's
    * repetition signals with no token ever leaving its row).
    */
  def tokenStats(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val a = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      a(i) = arr.getUTF8String(i)
      if (a(i) eq null) throw new IllegalArgumentException(
        "token_stats: input array contains a null element — tokens must " +
          "be non-null (fail-loud per the bucket_counts discipline; an " +
          "NPE from Arrays.sort would be opaque)")
      i += 1
    }
    java.util.Arrays.sort(a)
    var k = 0L
    var top = 0L
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && a(j) == a(i)) j += 1
      k += 1L
      if ((j - i).toLong > top) top = (j - i).toLong
      i = j
    }
    new GenericArrayData(Array(n.toLong, k, top))
  }

  /** [[termRunCounts]] for 64-bit fingerprint terms (see FpRunCounts). */
  def fpRunCounts(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = arr.getLong(i); i += 1 }
    java.util.Arrays.sort(a)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && a(j) == a(i)) j += 1
      out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](a(i), (j - i).toLong))
      i = j
    }
    new GenericArrayData(out.toArray)
  }

  /** Space-rejoin of the tokens whose 1-based position is NOT in
    * `drops` (sorted-ascending distinct ints) — q67's document
    * reassembly as one merge pass per row (see RemoveTokens). With empty
    * `drops` this is exactly `array_join(w, ' ')`.
    */
  def removeTokens(w: ArrayData, drops: ArrayData): UTF8String = {
    val n = w.numElements()
    val m = drops.numElements()
    val kept = new Array[UTF8String](n)
    var nk = 0
    var i = 0
    var d = 0
    while (i < n) {
      val pos = i + 1
      // advance defensively past any out-of-contract drop values (0,
      // negative, duplicate, unsorted) instead of letting a stuck cursor
      // silently disable all subsequent drops (ADVICE r21); for in-contract
      // sorted-distinct 1-based drops this loop runs at most once per pos
      while (d < m && drops.getInt(d) < pos) d += 1
      if (d < m && drops.getInt(d) == pos) d += 1
      else { kept(nk) = w.getUTF8String(i); nk += 1 }
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "),
      java.util.Arrays.copyOf(kept, nk): _*)
  }

  /** |A ∩ B| of two SORTED-ascending long arrays by linear merge — no
    * hash set, no intersection array materialized (see
    * SortedIntersectCount for the equivalence contract vs
    * `size(array_intersect)`).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  /** Count of array elements that test positive against a Bloom filter
    * (see BloomHits) — the streaming flaggers' membership probe as one
    * pass over the long array, no per-element Scala-UDF boxing.
    */
  def bloomHits(keys: ArrayData,
      bloom: org.apache.spark.util.sketch.BloomFilter): Long = {
    val n = keys.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      if (bloom.mightContainLong(keys.getLong(i))) hits += 1L
      i += 1
    }
    hits
  }

  /** Per-word occurrence counts (see TfCounts): counts of each element of
    * `words` in `toks`, one traversal of `toks` against a |words|-sized
    * hash map. Duplicate words copy the first occurrence's count.
    */
  def tfCounts(toks: ArrayData, words: ArrayData): ArrayData = {
    val m = words.numElements()
    val out = new Array[Long](m)
    val idx = new java.util.HashMap[UTF8String, Integer](m * 2)
    var j = 0
    while (j < m) { idx.putIfAbsent(words.getUTF8String(j), j); j += 1 }
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val p = idx.get(toks.getUTF8String(i))
      if (p != null) out(p) += 1
      i += 1
    }
    j = 0
    while (j < m) {
      val p = idx.get(words.getUTF8String(j))
      if (p != j) out(j) = out(p)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Σ length(x) over a token array in code points (see TokenLengthSum) —
    * `aggregate(t, 0L, (a, x) -> a + length(x))` without the fold lambda.
    */
  def tokenLengthSum(arr: ArrayData): Long = {
    val n = arr.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += arr.getUTF8String(i).numChars(); i += 1 }
    s
  }

  /** Number of maximal runs of non-space bytes (space = 0x20) — equals
    * `size(filter(split(text, '[ ]+'), x -> x <> ''))` for any input: the
    * split's non-empty segments are exactly those runs. Byte-level is safe:
    * 0x20 is never a UTF-8 continuation byte.
    */
  def wsTokenCount(s: UTF8String): Int = {
    val n = s.numBytes
    var count = 0
    var inRun = false
    var i = 0
    while (i < n) {
      if (s.getByte(i) == ' ') inRun = false
      else if (!inRun) { count += 1; inRun = true }
      i += 1
    }
    count
  }

  /** Match count of the BPE-ish alternation `[a-z]+|[0-9]+|[^a-z0-9 ]`
    * over the LOWERCASED text (see BpeishTokenCount): the regex engine's
    * left-to-right greedy scan is exactly "letter runs + digit runs + one
    * per other non-space code point", so one code-point walk reproduces
    * the regexp_extract_all count without the regex machinery.
    */
  def bpeishTokenCount(input: UTF8String): Int = {
    val s = input.toLowerCase.toString
    val n = s.length
    var count = 0
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp >= 'a' && cp <= 'z') {
        count += 1
        while (i < n && { val c = s.codePointAt(i); c >= 'a' && c <= 'z' }) i += Character.charCount(s.codePointAt(i))
      } else if (cp >= '0' && cp <= '9') {
        count += 1
        while (i < n && { val c = s.codePointAt(i); c >= '0' && c <= '9' }) i += Character.charCount(s.codePointAt(i))
      } else {
        if (cp != ' ') count += 1
        i += Character.charCount(cp)
      }
    }
    count
  }

  /** Nearest-centroid argmin (see NearestCentroid): squared-L2 over
    * emb[offset ..< offset+len] vs each centroid as a sequential double
    * fold; smallest distance wins, ties on the smaller label. Double.compare
    * orders NaN largest — the same verdicts as Spark's struct-min over
    * (d, label).
    */
  def nearestCentroid(emb: ArrayData, labels: Array[Long],
      cents: Array[Array[Double]], offset: Int): Long = {
    // UnsafeArrayData.getFloat past numElements reads garbage SILENTLY —
    // fail loudly on a codebook/vector dimension mismatch instead
    if (emb.numElements() < offset + cents(0).length)
      throw new IllegalArgumentException(
        s"nearest_centroid: vector has ${emb.numElements()} dims, " +
          s"codebook needs ${offset + cents(0).length} (offset $offset + len ${cents(0).length})")
    // getFloat on a NULL array slot likewise reads 0.0 SILENTLY (ArrayType
    // accepts containsNull=true input) — the compose form this kernel is
    // property-tested against propagates null instead, so fail loudly
    var e = 0
    while (e < cents(0).length) {
      if (emb.isNullAt(offset + e))
        throw new IllegalArgumentException(
          s"nearest_centroid: null element at index ${offset + e}; " +
            "embedding arrays must be null-free")
      e += 1
    }
    var bestD = Double.NaN
    var bestL = Long.MaxValue
    var first = true
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0
      var i = 0
      while (i < cent.length) {
        val x = emb.getFloat(offset + i).toDouble - cent(i)
        d += x * x
        i += 1
      }
      val cmp = java.lang.Double.compare(d, bestD)
      if (first || cmp < 0 || (cmp == 0 && labels(c) < bestL)) {
        bestD = d; bestL = labels(c); first = false
      }
      c += 1
    }
    bestL
  }

  /** First top-level field named `key` of a JSON OBJECT, parsed as a long
    * (see JsonLongField). One byte-level scan, no parser allocation: ASCII
    * structural bytes ('{' '"' ':' ',') can never be UTF-8 continuation
    * bytes, so multibyte text inside skipped strings is walked safely.
    * Verdicts mirror get_json_object(s,'$.key') CAST AS LONG: integers
    * parse, floats truncate toward zero (legacy-cast fraction handling),
    * and absent keys, strings, bools, nulls, nested values, exponent forms,
    * long overflow and non-object input are all null.
    */
  def jsonLongField(json: UTF8String, key: UTF8String): java.lang.Long = {
    val n = json.numBytes
    var i = 0
    @inline def b(): Byte = json.getByte(i)
    def ws(): Unit = {
      while (i < n && { val c = b(); c == ' ' || c == '\t' || c == '\n' || c == '\r' }) i += 1
    }
    // skip a string body; i enters AFTER the opening quote, leaves after the
    // closing quote. Returns false on truncated input.
    def skipString(): Boolean = {
      while (i < n) {
        val c = b()
        if (c == '\\') i += 2
        else if (c == '"') { i += 1; return true }
        else i += 1
      }
      false
    }
    ws()
    if (i >= n || b() != '{') return null
    i += 1
    var first = true
    while (i < n) {
      ws()
      if (i < n && b() == '}') return null // end of object, key absent
      if (!first) {
        if (i >= n || b() != ',') return null
        i += 1; ws()
      }
      first = false
      if (i >= n || b() != '"') return null
      i += 1
      val keyStart = i
      var escaped = false
      while (i < n && b() != '"') { if (b() == '\\') { escaped = true; i += 2 } else i += 1 }
      if (i >= n) return null
      val keyEnd = i
      i += 1 // past closing quote
      ws()
      if (i >= n || b() != ':') return null
      i += 1; ws()
      if (i >= n) return null
      val klen = key.numBytes
      var matches = !escaped && (keyEnd - keyStart) == klen
      if (matches) {
        var j = 0
        while (matches && j < klen) {
          if (json.getByte(keyStart + j) != key.getByte(j)) matches = false
          j += 1
        }
      }
      if (matches) {
        // parse an integer value; anything else → null. Accumulate NEGATED
        // (the classic Long.parseLong shape): Long.MinValue has no positive
        // twin, so positive accumulation would null-overflow on the one
        // value -9223372036854775808 that the built-in CAST parses fine.
        var neg = false
        if (b() == '-') { neg = true; i += 1 }
        if (i >= n || b() < '0' || b() > '9') return null
        val limit = if (neg) Long.MinValue else -Long.MaxValue
        val multmin = limit / 10
        var acc = 0L
        while (i < n && b() >= '0' && b() <= '9') {
          val d = b() - '0'
          if (acc < multmin) return null // overflow
          acc *= 10
          if (acc < limit + d) return null // overflow
          acc -= d
          i += 1
        }
        // fraction part: truncate toward zero, like the legacy CAST(string
        // AS LONG) the built-in routes through (UTF8String.toLong accepts
        // "int.frac" and drops the fraction); exponent forms stay null there
        if (i < n && b() == '.') {
          i += 1
          if (i >= n || b() < '0' || b() > '9') return null
          while (i < n && b() >= '0' && b() <= '9') i += 1
        }
        if (i < n && { val c = b(); c == 'e' || c == 'E' }) return null
        if (i < n && { val c = b(); c != ',' && c != '}' && c != ' ' && c != '\t' && c != '\n' && c != '\r' }) return null
        return java.lang.Long.valueOf(if (neg) acc else -acc)
      }
      // skip this value
      val c0 = b()
      if (c0 == '"') { i += 1; if (!skipString()) return null }
      else if (c0 == '{' || c0 == '[') {
        var depth = 0
        var ok = false
        while (i < n && !ok) {
          val c = b()
          if (c == '"') { i += 1; if (!skipString()) return null }
          else {
            if (c == '{' || c == '[') depth += 1
            else if (c == '}' || c == ']') { depth -= 1; if (depth == 0) ok = true }
            i += 1
          }
        }
        if (!ok) return null
      } else {
        while (i < n && { val c = b(); c != ',' && c != '}' }) i += 1
      }
    }
    null
  }

  /** 1-based vocab index per token, 0 when absent — semantically
    * `transform(t, w -> array_position(vw, w))` (vocab entries are
    * distinct, so first-occurrence vs any-occurrence cannot differ) as
    * ONE hash-lookup pass instead of an interpreted lambda running a
    * linear scan per token.
    */
  def classSeq(toks: ArrayData, words: ArrayData): ArrayData = {
    val m = words.numElements()
    val idx = new java.util.HashMap[UTF8String, java.lang.Long](m * 2)
    var j = 0
    while (j < m) {
      idx.putIfAbsent(words.getUTF8String(j), java.lang.Long.valueOf(j + 1L))
      j += 1
    }
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val p = idx.get(toks.getUTF8String(i))
      out(i) = if (p == null) 0L else p.longValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Adjacent-class pair keys `cls[i−1]·c + cls[i]` (length n−1) — the
    * bigram-count emit as a tight loop instead of an interpreted
    * indexed-lambda transform.
    */
  def classBigramKeys(cls: ArrayData, c: Int): ArrayData = {
    val n = cls.numElements()
    val out = new Array[Long](math.max(n - 1, 0))
    var i = 1
    while (i < n) {
      out(i - 1) = cls.getLong(i - 1) * c + cls.getLong(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The interpolated bigram-LM per-doc score: the EXACT arithmetic of
    * the SQL fold (TextOps.bigramNllExpr / the DuckDB oracle) — per
    * position, term = 0.5·(cb[a·C+b]/cu[a]) + 0.5·(cu[b]/total) with
    * each division performed before its 0.5 multiply, ln-summed LEFT TO
    * RIGHT from 0.0, negated, divided by (n−1); total = Σcu (exact long
    * — cu is [OOV, vocab...] so the sum IS the corpus token total by
    * construction). Bit-identical to the interpreted HOF form by IEEE
    * determinism (BigramLmSpec pins it), ~50× faster (the lambdas do
    * not participate in codegen; this kernel does).
    *
    * Zero-count classes are guarded with the unigram path's
    * `greatest(·, 1)` discipline: when the model trained on a corpus
    * with no OOV tokens (cu[0] == 0) but a FROZEN-model consumer (stream
    * twin, a stamped [[graft.sources.BigramLm]] scoring a refreshed doc
    * set) meets an OOV prefix, the unguarded form computed 0.0/0.0 = NaN
    * and quantized silently. Same-corpus scoring can never index a
    * zero-count class (every class at a scored position occurred in
    * training), so the floors are arithmetic no-ops there and batch
    * bit-identity is untouched; both mirrors (bigramNllExpr, the DuckDB
    * CTE) carry the identical greatest() so the pin still holds.
    */
  def bigramNll(cls: ArrayData, cb: ArrayData, cu: ArrayData): Double = {
    val c = cu.numElements()
    var total = 0L
    var j = 0
    while (j < c) { total += cu.getLong(j); j += 1 }
    val totalD = total.toDouble
    val n = cls.numElements()
    var acc = 0.0
    var i = 1
    while (i < n) {
      val a = cls.getLong(i - 1).toInt
      val b = cls.getLong(i).toInt
      val cua = cu.getLong(a)
      val cub = cu.getLong(b)
      val term = 0.5 * (cb.getLong(a * c + b).toDouble /
          (if (cua > 0L) cua else 1L).toDouble) +
        0.5 * ((if (cub > 0L) cub else 1L).toDouble / totalD)
      // StrictMath, not Math: Spark's SQL `ln` is StrictMath.log, and the
      // intrinsic Math.log differs by an ulp on some inputs — the kernel
      // must be bit-identical to the HOF formulation it replaces
      acc += java.lang.StrictMath.log(term)
      i += 1
    }
    -acc / (n - 1).toDouble
  }

  /** Character-distribution statistics `[n, k, s2]` over a string's code
    * points (see CharStats): n = total code points, k = distinct code
    * points, s2 = Σ countᶜ² — the exact integers behind the Simpson
    * collision concentration s2/n² (q120's gibberish/corruption gate).
    * Sort + run-length like [[dupRunStats]] (O(n log n) per row, zero
    * hashing, map-only), vs the oracle's explode→GROUP BY histogram.
    * Empty input → [0, 0, 0]; the CONSUMER owns the n = 0 division rule
    * (Spark and DuckDB disagree on 0/0, so q120 filters n > 0).
    */
  def charStats(s: UTF8String): ArrayData = {
    val str = s.toString
    val cps = new Array[Int](str.length)
    var i = 0
    var n = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps, 0, n)
    var k = 0L
    var s2 = 0L
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && cps(j) == cps(i)) j += 1
      val run = (j - i).toLong
      k += 1L
      s2 += run * run
      i = j
    }
    new GenericArrayData(Array(n.toLong, k, s2))
  }

  /** Content-defined chunking of a token array (see CdcChunks): a chunk
    * ends AT every token whose [[RollingHash]] is ≡ 0 (mod divisor) — the
    * storage-dedup cut rule with the synchronization property fixed-width
    * windows (q69) lack: an insertion shifts every downstream fixed
    * window but CDC boundaries re-align at the next cut token, so
    * unchanged regions re-produce identical chunks. Chunks come back as
    * space-joined strings in document order; a trailing run with no cut
    * token is the final chunk; empty input → no chunks. One pass, one
    * hash per token (the q17 fingerprint fold), map-only.
    */
  def cdcChunks(toks: ArrayData, divisor: Int): ArrayData = {
    if (divisor <= 0) throw new IllegalArgumentException(
      s"cdc_chunks: divisor $divisor must be positive")
    val n = toks.numElements()
    val out = new java.util.ArrayList[UTF8String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i).toString
      if (sb.length > 0) sb.append(' ')
      sb.append(t)
      if (RollingHash.hash(t) % divisor == 0L) {
        out.add(UTF8String.fromString(sb.toString))
        sb.setLength(0)
      }
      i += 1
    }
    if (sb.length > 0) out.add(UTF8String.fromString(sb.toString))
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  /** (x[i] − mean[i mod mean.length]) · scale per element (see
    * VecNormalize): mean.length == channels covers the per-channel
    * `mean_value` mode on interleaved HWC data, mean.length == x.length
    * the per-pixel `mean_file` mode — one modulo rule for both.
    */
  def vecNormalize(x: ArrayData, mean: Array[Float], scale: Float): ArrayData = {
    val n = x.numElements()
    if (n % mean.length != 0)
      throw new IllegalArgumentException(
        s"vec_normalize: vector length $n not a multiple of mean length ${mean.length}")
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = (x.getFloat(i) - mean(i % mean.length)) * scale
      i += 1
    }
    new GenericArrayData(out)
  }

}
