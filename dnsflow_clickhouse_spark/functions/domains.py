"""Domain-string column expressions.

- ``authority_domain`` re-expresses the reference's "authority domain"
  (public-suffix-ish) extraction: the *last* regex match over the domain,
  falling back to the whole domain when nothing matches
  (reference: Utils.scala:62-77, regex at Constant.scala:10-18).
- ``is_junk_domain`` is the ingest hygiene filter
  (reference: DnsRptCH.scala:879-887).
- ``strip_scheme`` removes http(s):// prefixes
  (reference: DnsRptCH.scala:217-219).

All pure Catalyst expressions; the regex is evaluated JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Suffix alternation equivalent to the reference's REGULAR_DOMAIN
# (Constant.scala:10-18). Quirk preserved on purpose: multi-label suffixes
# like ``.com.cn`` have an *unescaped* middle dot in the reference (so
# ``\.com.cn`` matches e.g. "x.comzcn") and are not $-anchored, while the
# single-label suffixes are $-anchored. We keep the same alternation text
# so extraction results match the reference bit-for-bit.
_SUFFIXES = (
    r"(\.com.cn)|(\.arpa)|(\.com.hk)|(\.com$)|(\.net.cn)|(\.net)"
    r"|(\.gov.cn)|(\.gov)|(\.org.cn)|(\.org)|(\.edu.com)|(\.edu.cn)|(\.edu.hk)|(\.edu)|(\.cn)"
    r"|(\.cc$)|(\.tv$)|(\.me$)|(\.info$)|(\.la$)|(\.so$)|(\.mobi$)|(\.co$)"
    r"|(\.im$)|(\.biz$)|(\.io$)|(\.in$)|(\.name$)|(\.fm$)|(\.cm$)|(\.us$)|(\.pw$)"
    r"|(\.tw$)|(\.sh$)|(\.asia$)|(\.de$)|(\.mx$)|(\.vc$)|(\.gg$)|(\.tm$)|(\.ac$)"
    r"|(\.gd$)|(\.gs$)|(\.am$)|(\.tt$)|(\.bz$)|(\.to$)|(\.ly$)|(\.li$)|(\.jp$)"
    r"|(\.ms$)|(\.pro$)|(\.eu$)|(\.lu$)|(\.ru$)|(\.ch$)|(\.ma$)|(\.home$)|(\.mo$)"
    r"|(\.dj$)|(\.re$)|(\.cz$)|(\.ai$)|(\.sg$)|(\.id$)|(\.ph$)|(\.ec$)|(\.cd$)"
    r"|(\.travel$)|(\.nu$)|(\.my$)|(\.pk$)|(\.aero$)|(\.hn$)|(\.ba$)|(\.uk$)|(\.es$)"
)

# Non-capturing form of the same alternation (so regexp_extract group
# numbering stays at 1 for the full authority-domain token).
_SUFFIXES_NC = (
    _SUFFIXES.replace("(", "(?:").replace("(?:?:", "(?:")  # idempotent guard
)

AUTHORITY_PATTERN = rf"[0-9a-zA-Z\-]+(?:{_SUFFIXES_NC})"

def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def authority_domain(domain: Column | str) -> Column:
    """Last authority-domain match; whole domain when no match.

    The reference loops ``while (matcher.find())`` keeping the final
    match (Utils.scala:67-71) — i.e. the last of the *leftmost
    non-overlapping* scan. ``regexp_extract_all`` has exactly those scan
    semantics in both Spark (Java regex) and DuckDB (RE2), so the last
    array element reproduces the reference bit-for-bit.
    """
    c = _col(domain)
    matches = F.regexp_extract_all(c, F.lit(AUTHORITY_PATTERN), 0)
    return F.when(F.size(matches) > 0, F.element_at(matches, -1)).otherwise(c)


def strip_scheme(domain: Column | str) -> Column:
    """Remove a leading http:// or https:// (reference: DnsRptCH.scala:217-219)."""
    return F.regexp_replace(_col(domain), r"^https?://", "")


# Ingest hygiene: the reference drops empty domains and a fixed set of
# junk markers (DnsRptCH.scala:879-887).
_JUNK_MARKERS = ["master01", ".localdomain", " ", "DHCP", "HOST", "Relteak", "getCached", "BlinkAP"]


def is_junk_domain(domain: Column | str) -> Column:
    """True for rows the ingest filter must drop."""
    c = _col(domain)
    cond = c.isNull() | (c == "")
    for marker in _JUNK_MARKERS:
        cond = cond | c.contains(marker)
    return cond
