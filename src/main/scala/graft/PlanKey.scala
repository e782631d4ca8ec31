package graft

import org.apache.spark.sql.DataFrame

/** 128-bit identity for a DataFrame's ANALYZED plan, used to key
  * session-cached search artifacts (MinHash pairs, n-gram pairs, span
  * frames) by their input.
  *
  * `semanticHash()` — the previous key — is a 32-bit Int, so a
  * long-lived session caching artifacts over many distinct inputs
  * (per-batch ingest frames) collides with birthday probability
  * ~n²/2³³ and would silently serve one corpus's cached pairs as
  * another's.
  *
  * The digest folds together:
  *  - the canonicalized plan's tree string (canonicalization
  *    normalizes expression ids, so two structurally-identical reads
  *    agree) — it carries the plan STRUCTURE, literals, filters,
  *    column sets at 128 bits;
  *  - the canonicalized plan's hashCode — the exact value the old
  *    `semanticHash()` key was. This term is REQUIRED, not
  *    belt-and-braces: `toString` elides what leaves don't print — a
  *    `LocalRelation` shows its schema but never its rows, and a file
  *    relation's string can omit its paths — so a string-only digest
  *    served one corpus's span frame to a DIFFERENT corpus in a
  *    round-9 cut of this class (the warmup's sf0.001 frame answered
  *    the sf0.01 entry). The hashCode hashes relation identity and
  *    LocalRelation data, restoring at least the old discrimination
  *    wherever strings collide.
  *
  * A wrong-result collision therefore needs BOTH a tree-string
  * collision and a 32-bit hash collision — strictly stronger than
  * either key alone, and strictly stronger than the previous
  * semanticHash-only key.
  */
object PlanKey {
  def of(df: DataFrame): String = {
    val canon = df.queryExecution.analyzed.canonicalized
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(canon.toString.getBytes("UTF-8"))
    md.update(java.nio.ByteBuffer.allocate(4).putInt(canon.hashCode()).array())
    md.digest().map("%02x".format(_)).mkString
  }
}
