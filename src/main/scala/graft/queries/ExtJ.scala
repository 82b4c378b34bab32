package graft.queries

import org.apache.spark.sql.functions._
import graft.ext._
import H.t

/** Round-13 operators: checksum-validated PII (Luhn cards + IBAN
  * mod-97), line-level quality rules and newline paragraph dedup over
  * deterministically injected newline structure, the Naive-Bayes
  * model-quality filter, and the unigram-LM tokenizer pair.
  */
object ExtJ {

  /** doc_id-keyed PII bait shared by the engine and oracle halves of
    * x_text_pii2 (the encGarbage injection discipline): Luhn-valid and
    * Luhn-INVALID 16-digit candidates (public test numbers), a 20-digit
    * run that must NOT match the word-bounded 16-digit pattern, and
    * mod-97-valid/-invalid IBANs across three digit-BBAN countries.
    * Every constant was verified against an independent Python
    * implementation of both checksums.
    */
  private def piiBait = concat(
    when(col("doc_id") % 7 === 0, lit(" 4111111111111111"))
      .when(col("doc_id") % 7 === 3, lit(" 4111111111111112"))
      .otherwise(lit("")),
    when(col("doc_id") % 11 === 0, lit(" 1234567890123456"))
      .otherwise(lit("")),
    when(col("doc_id") % 13 === 0, lit(" 41111111111111112222"))
      .otherwise(lit("")),
    when(col("doc_id") % 5 === 0, lit(" DE89370400440532013000"))
      .when(col("doc_id") % 5 === 2, lit(" DE89370400440532013001"))
      .otherwise(lit("")),
    when(col("doc_id") % 17 === 0, lit(" AT611904300234573201"))
      .otherwise(lit("")),
    when(col("doc_id") % 19 === 0, lit(" PL61109010140000071219812874"))
      .otherwise(lit("")))
  private val piiBaitSql = """
        CASE WHEN doc_id % 7 = 0 THEN ' 4111111111111111'
          WHEN doc_id % 7 = 3 THEN ' 4111111111111112' ELSE '' END ||
        CASE WHEN doc_id % 11 = 0 THEN ' 1234567890123456' ELSE '' END ||
        CASE WHEN doc_id % 13 = 0 THEN ' 41111111111111112222' ELSE '' END ||
        CASE WHEN doc_id % 5 = 0 THEN ' DE89370400440532013000'
          WHEN doc_id % 5 = 2 THEN ' DE89370400440532013001' ELSE '' END ||
        CASE WHEN doc_id % 17 = 0 THEN ' AT611904300234573201' ELSE '' END ||
        CASE WHEN doc_id % 19 = 0 THEN ' PL61109010140000071219812874'
          ELSE '' END"""

  /** Checksum-validated PII ([[Text.piiChecksums]]): Luhn mod-10 on
    * word-bounded 16-digit card candidates, ISO 13616 mod-97 on
    * digit-BBAN IBAN candidates, plus validated-only redaction. The
    * bait plants deliberately Luhn-invalid and mod-97-invalid
    * candidates so the oracle adjudicates BOTH directions — a
    * regex-only pass would flag (and mangle) them; the checksum pass
    * must count them as candidates but leave them untouched in
    * `redacted_text`. Hash-exact: integer checksum arithmetic, counts,
    * and byte-for-byte redacted text.
    */
  val xTextPii2 = Q(
    "x_text_pii2",
    (s, dir) => {
      val injected = t(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"), piiBait).as("text"))
      Text.piiChecksums(injected, "text", "doc_id").orderBy(col("doc_id"))
    },
    Some(s"""WITH inj AS (SELECT doc_id, text || $piiBaitSql AS t
        FROM documents),
      c AS (SELECT doc_id, t,
        regexp_extract_all(t, '\\b[0-9]{16}\\b') AS cards,
        regexp_extract_all(t, '\\b[A-Z]{2}[0-9]{13,32}\\b') AS ibans
      FROM inj),
      v AS (SELECT doc_id, t, cards, ibans,
        list_filter(cards, cd -> list_sum(list_transform(range(1, 17),
          i -> CASE WHEN i % 2 = 1
            THEN 2 * (ascii(substr(cd, CAST(i AS INT), 1)) - 48)
              - CASE WHEN ascii(substr(cd, CAST(i AS INT), 1)) - 48 > 4
                THEN 9 ELSE 0 END
            ELSE ascii(substr(cd, CAST(i AS INT), 1)) - 48 END)) % 10 = 0)
          AS vcards,
        list_filter(ibans, ib -> list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_concat(
              list_transform(range(5, length(ib) + 1),
                i -> CAST(ascii(substr(ib, CAST(i AS INT), 1)) - 48 AS BIGINT)),
              [CAST((ascii(substr(ib, 1, 1)) - 55) // 10 AS BIGINT),
               CAST((ascii(substr(ib, 1, 1)) - 55) % 10 AS BIGINT),
               CAST((ascii(substr(ib, 2, 1)) - 55) // 10 AS BIGINT),
               CAST((ascii(substr(ib, 2, 1)) - 55) % 10 AS BIGINT),
               CAST(ascii(substr(ib, 3, 1)) - 48 AS BIGINT),
               CAST(ascii(substr(ib, 4, 1)) - 48 AS BIGINT)])),
          (acc, d) -> (acc * 10 + d) % 97) = 1) AS vibans
      FROM c)
      SELECT doc_id,
        CAST(len(cards) AS BIGINT) AS n_card_candidates,
        CAST(len(vcards) AS BIGINT) AS n_card_valid,
        CAST(len(ibans) AS BIGINT) AS n_iban_candidates,
        CAST(len(vibans) AS BIGINT) AS n_iban_valid,
        (len(vcards) > 0 OR len(vibans) > 0) AS has_valid_pii,
        list_reduce(list_prepend(
            list_reduce(list_prepend(t, vcards),
              (acc, x) -> replace(acc, x, '<PAN>')),
            vibans),
          (acc, x) -> replace(acc, x, '<IBAN>')) AS redacted_text
      FROM v ORDER BY doc_id"""))

  val queries: Seq[Q] = Seq(xTextPii2)
}
