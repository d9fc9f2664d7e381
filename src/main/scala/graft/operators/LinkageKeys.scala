package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Normalization keys for entity resolution — the feature-derivation
  * layer [[RecordLinkage]] (field weights) and [[SortedNeighborhood]]
  * (sort keys) both consume: raw names/phones/addresses never compare
  * equal across systems until case, punctuation, spacing and formatting
  * noise are normalized away. Every key is a pure scan-stage expression
  * in the Java-regex ∩ RE2 portable subset (the [[graft.text.Pii]]
  * discipline — no lookarounds, no backreferences), so derived keys —
  * and therefore the whole linkage run — replay bit-identically in the
  * oracle.
  *
  * These are deliberately SIMPLE, deterministic normalizations (the
  * blocking/weighting layers tolerate residual noise by design);
  * phonetic codes (Soundex-class) are NOT here because no portable
  * cross-engine definition exists — the consonant skeleton below covers
  * most of their blocking value with exact semantics.
  */
object LinkageKeys {

  /** Lowercased, punctuation → space, whitespace collapsed, trimmed —
    * the canonical comparison form of any name-like string.
    */
  def normName(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9]+", " "), " +", " "))

  /** Digits only — the canonical phone/account-number form ("+1 (555)
    * 010-9999" and "15550109999" collide).
    */
  def digitsOnly(c: Column): Column =
    regexp_replace(c, "[^0-9]+", "")

  /** Consonant skeleton of the normalized name: every vowel-or-y run
    * FOLLOWING a non-vowel is dropped, keeping word-initial characters —
    * "smith"/"smyth" both become "smth", "jon"/"john" become "jn"/"jhn":
    * keys that sort (and usually hash) together, the deterministic
    * stand-in for phonetic blocking. A doubled-letter collapse would
    * need a backreference, which RE2 lacks — deliberately absent.
    */
  def skeleton(c: Column): Column =
    regexp_replace(normName(c), "([^aeiouy ])[aeiouy]+", "$1")

  /** First `n` characters of the normalized form — the classic
    * sorted-neighborhood / blocking prefix key.
    */
  def prefixKey(c: Column, n: Int): Column = {
    require(n >= 1, s"prefix length must be >= 1, got $n")
    substring(normName(c), 1, n)
  }

  // ------------------------------------------------- DuckDB oracle SQL ----
  // Same constants, same order of operations — generated mirrors so the
  // Spark path and the oracle cannot drift.

  def normNameSql(e: String): String =
    s"trim(regexp_replace(regexp_replace(lower($e), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))"

  def digitsOnlySql(e: String): String =
    s"regexp_replace($e, '[^0-9]+', '', 'g')"

  def skeletonSql(e: String): String =
    s"regexp_replace(${normNameSql(e)}, '([^aeiouy ])[aeiouy]+', '\\1', 'g')"

  def prefixKeySql(e: String, n: Int): String =
    s"substr(${normNameSql(e)}, 1, $n)"
}
