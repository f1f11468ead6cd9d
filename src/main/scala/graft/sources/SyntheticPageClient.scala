package graft.sources

/** Deterministic, network-free [[PaginatedSource.PageClient]] generating the
  * reference's page-envelope shape (FIXTURES.md "Reference-shape fixtures"):
  * `{"count": N, "items": [{"keys": {...}, "values": {...}}]}`.
  *
  * Used by the connector unit tests and the `src1_paginated_connector`
  * registered query. Every field is a pure function of the item index, so a
  * DuckDB oracle can regenerate the exact expected output without any JSON:
  *  - every 37th item has an unparseable date (exercises F3 null-on-failure),
  *  - every 53rd item omits the `session_id` key (exercises P1's
  *    empty-string-not-null defaulting),
  *  - `event_name` carries a query string (exercises F1/F2).
  */
final class SyntheticPageClient(totalItems: Int, pageSize: Int = PaginatedSource.PageSize,
                                failFirstFetches: Int = 0)
    extends PaginatedSource.PageClient {

  /** Counts fetch attempts so tests can assert the SRC3 single-retry. */
  @volatile var fetches: Int = 0

  def fetchPage(page: Int): String = {
    fetches += 1
    if (fetches <= failFirstFetches)
      throw new PaginatedSource.UnauthorizedException(s"401 on fetch #$fetches")
    val start = (page - 1) * pageSize
    val end = math.min(start + pageSize, totalItems)
    val items = (start until end).map(itemJson)
    s"""{"count":$totalItems,"items":[${items.mkString(",")}]}"""
  }

  private def itemJson(i: Int): String = {
    val sessionPart =
      if (i % 53 == 0) "" else s""""session_id":"S-${i / 7}","""
    val date =
      if (i % 37 == 0) "not-a-date"
      else f"${1 + i % 12}/${1 + i % 28}/2025 ${1 + i % 12}:${i % 60}%02d:00 ${if (i % 2 == 0) "AM" else "PM"}"
    s"""{"keys":{"lead_id":"L-${i % 997}","url":"https://x/p/$i?utm=$i",$sessionPart"order":"${i % 5}"},""" +
      s""""values":{"type_id":"T-${i % 13}","event_category":"cat${i % 3}","event_name":"ev_${i % 11}?src=mail","date":"$date"}}"""
  }
}
