package graft.functions

import org.apache.spark.sql.Column

/** NFC dedup-key hygiene — the composed/decomposed Unicode trap:
  * "café" composed (U+00E9) and decomposed (e + U+0301) are DIFFERENT
  * byte strings to every hash/groupBy/join in this engine, so the
  * same document crawled from two sources survives exact dedup unless
  * keys normalize first. NFC is the W3C-recommended storage form; the
  * JDK's `java.text.Normalizer` implements the same Unicode algorithm
  * as DuckDB's utf8proc `nfc_normalize`, so the transform is
  * oracle-verifiable byte-for-byte.
  *
  * This is a thin alias for [[NormalizeUnicodeExpr]] with form "NFC"
  * — ONE codegen'd implementation serves both the general
  * `graft_normalize_unicode(text, form)` SQL surface and this
  * dedup-key entry point (two parallel expressions for the same
  * transform are tomorrow's divergence bug). The shared kernel
  * ([[TextStats.normalizeUnicode]]) short-circuits via
  * `Normalizer.isNormalized`, so already-NFC (in particular
  * pure-ASCII) text skips the decompose/recompose allocation — the
  * fast path benefits all four forms.
  */
object NfcNormalize {
  def apply(c: Column): Column = NormalizeUnicodeExpr(c, "NFC")
}
