"""IP address column expressions — pure built-in functions (codegen'd).

Semantics mirror the reference's helpers:

- ``ip_to_long``: big-endian dotted-quad packing, malformed input -> 0
  (reference: Utils.scala:82-99, IpUtil.java:304-313).
- ``long_to_ip``: the inverse (reference: DNSUtils.scala:39).

No Python UDFs: these compile to Catalyst expressions inside
WholeStageCodegen, so they cost nothing extra at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def ip_to_long(ip: Column | str) -> Column:
    """Dotted-quad string -> int64 (big-endian). Malformed -> 0.

    ``a.b.c.d`` -> ``a*2^24 + b*2^16 + c*2^8 + d``. The reference returns 0
    for any input that does not split into exactly 4 parts; non-numeric
    parts throw there (caught by the record-level try) — here they null
    out the cast and we coalesce to 0, which subsumes both behaviors.
    """
    c = _col(ip)
    parts = F.split(c, r"\.")
    # try_cast: non-numeric octets null out (ANSI-safe) -> coalesce to 0,
    # matching the reference's catch-and-drop behavior.
    packed = (
        F.element_at(parts, 1).try_cast("long") * F.lit(16777216)
        + F.element_at(parts, 2).try_cast("long") * F.lit(65536)
        + F.element_at(parts, 3).try_cast("long") * F.lit(256)
        + F.element_at(parts, 4).try_cast("long")
    )
    return F.when(F.size(parts) == 4, F.coalesce(packed, F.lit(0))).otherwise(
        F.lit(0)
    )


def long_to_ip(v: Column | str) -> Column:
    """int64 -> dotted-quad string (inverse of ip_to_long)."""
    c = _col(v).cast("long")
    return F.concat_ws(
        ".",
        (F.shiftright(c, 24).bitwiseAND(255)).cast("string"),
        (F.shiftright(c, 16).bitwiseAND(255)).cast("string"),
        (F.shiftright(c, 8).bitwiseAND(255)).cast("string"),
        (c.bitwiseAND(255)).cast("string"),
    )


def is_in_range(ip: Column | str, cidr: Column | str) -> Column:
    """CIDR membership: true iff ``ip`` falls inside ``cidr`` (a
    ``"a.b.c.d/len"`` string). Pure expressions — no UDF.

    Mirrors the reference's ``isInRange`` (IpUtil.java:13-25): both
    addresses are masked to the top ``len`` bits and compared. The Java
    code computes ``0xFFFFFFFF << (32 - len)`` with int shifts, so
    ``/0`` degenerates to a full 32-bit compare (Java shift counts are
    mod 32); we reproduce that via ``shift = (32 - len) % 32`` so the
    two implementations agree on every input, including the degenerate
    prefix.
    """
    c = _col(cidr)
    prefix = F.element_at(F.split(c, "/"), 2).try_cast("int")
    base = F.element_at(F.split(c, "/"), 1)
    shift = (F.lit(32) - prefix) % F.lit(32)
    return F.call_function(
        "shiftright", ip_to_long(ip), shift
    ) == F.call_function("shiftright", ip_to_long(base), shift)


def cidr_bounds(cidr: Column | str) -> Column:
    """``"a.b.c.d/len"`` -> struct(lo, hi): the inclusive int64 bounds of
    the network (network address .. broadcast address).

    The expression form of the reference's netmask helpers
    (IpUtil.java:30-293 ``getBeginIpStr``/``getEndIpStr``); combined
    with :func:`long_to_ip` it reproduces their string outputs. Same
    mod-32 shift convention as :func:`is_in_range`.
    """
    c = _col(cidr)
    prefix = F.element_at(F.split(c, "/"), 2).try_cast("int")
    base = F.element_at(F.split(c, "/"), 1)
    shift = (F.lit(32) - prefix) % F.lit(32)
    lo = F.call_function(
        "shiftleft", F.call_function("shiftright", ip_to_long(base), shift), shift
    )
    hi = lo + F.call_function("shiftleft", F.lit(1).cast("long"), shift) - F.lit(1)
    return F.struct(lo.alias("lo"), hi.alias("hi"))


def cidr_ip_count(cidr: Column | str) -> Column:
    """Number of addresses covered by the CIDR (reference:
    IpUtil.java ``getIpCount``: ``2^(32-len)``)."""
    prefix = F.element_at(F.split(_col(cidr), "/"), 2).try_cast("int")
    # no mod-32 here: the reference's getIpCount uses Math.pow, not int
    # shifts, so /0 really is 2^32 (long shifts carry it exactly).
    return F.call_function("shiftleft", F.lit(1).cast("long"), F.lit(32) - prefix)


def first_octet(ip: Column | str) -> Column:
    """First octet of a dotted-quad — the geo prefix-index key.

    Mirrors the reference's first-octet prefix index over the binary geo
    database (reference: IpSearch.java:63-74); used to turn the geo range
    join into an equi-join on octet + range filter at scale.
    """
    return F.element_at(F.split(_col(ip), r"\."), 1).cast("int")
