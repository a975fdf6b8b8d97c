"""Deterministic DNS-shaped fixtures per FIXTURES.md: a 5-minute window
of raw events (including every documented edge case) plus the dimension
tables, and a pure-python mirror of the expected base-event derivation
used as an in-test oracle.
"""

from __future__ import annotations

import json
import random

APP_TIME = 1_700_000_000 - (1_700_000_000 % 300)  # aligned window start
WINDOW = 300

CLIENT_RULES = [  # (min_long_ip, max_long_ip, client_type_id)
    (ip := (10 << 24), ip + 255, 1),  # 10.0.0.0/24 -> client 1
    ((10 << 24) + 256, (10 << 24) + 511, 2),  # 10.0.1.x -> client 2
    ((192 << 24) + (168 << 16), (192 << 24) + (168 << 16) + 65535, 3),
]

MEDIA_RULES = [((172 << 24), (172 << 24) + (1 << 16) - 1)]  # intranet
SEGMENT_RULES = [  # business ranges; idx 1 overlaps 0 -> last-match wins
    ((172 << 24), (172 << 24) + 100, "cacheA", "cdn", "video", 0),
    ((172 << 24) + 50, (172 << 24) + 200, "cacheB", "cdn", "web", 1),
]

GEO = [  # disjoint, ordered
    ((172 << 24), (172 << 24) + (1 << 16) - 1, "中国", "浙江", "杭州", "电信"),
    ((8 << 24), (8 << 24) + (1 << 24) - 1, "美国", "加州", "山景城", "谷歌"),
    ((1 << 24), (1 << 24) + (1 << 16) - 1, "中国", "上海", "上海", "联通"),
]

WHITELIST = ["rare.baidu.com"]

AUTH_DOMAINS = [  # (authorityDomain, company, soft, website, type, rule_idx)
    ("baidu.com", "百度", "search", "baidu", "portal", 0),
    ("qq.com", "腾讯OLD", "im", "qq", "social", 1),
    ("qq.com", "腾讯", "im", "qq", "social", 2),  # dup key: last wins
]

USERS = [("10.0.0.1", "alice"), ("10.0.0.2", "bob")]
USER_INFO = [("alice", "137", "hangzhou"), ("bob", "138", "ningbo")]
DOMAIN_TAGS = [("www.baidu.com", "search", "web", "cn"), ("www.qq.com", "social", "im", "cn")]


def _ip(o1, o2, o3, o4):
    return f"{o1}.{o2}.{o3}.{o4}"


def make_raw_events() -> list[dict]:
    """~600 in-window events + pinned edge cases."""
    rng = random.Random(42)
    events = []
    domains = ["www.baidu.com", "www.qq.com", "img.taobao.com", "x.weird.zzz", "rare.baidu.com"]
    clients = [_ip(10, 0, 0, 1), _ip(10, 0, 0, 2), _ip(10, 0, 1, 9), _ip(192, 168, 3, 4), _ip(44, 1, 1, 1)]
    aips = [_ip(172, 0, 0, 60), _ip(8, 8, 8, 8), _ip(1, 0, 0, 9)]
    for i in range(600):
        dom = domains[rng.randrange(len(domains))]
        rc = [0, 0, 0, 0, 2, 3, 5][rng.randrange(7)]
        answers = (
            []
            if rc != 0 or rng.random() < 0.1
            else [
                {"Type": "CNAME", "Value": f"cn{i}.cdn.net"},
                {"Type": "A", "Value": aips[rng.randrange(len(aips))]},
            ]
        )
        events.append(
            {
                "Timestamp": APP_TIME + rng.randrange(WINDOW),
                "ServerIP": _ip(223, 5, 5, rng.randrange(2) + 1),
                "ClientIP": clients[rng.randrange(len(clients))],
                "Domain": dom,
                "Type": ["A", "A", "A", "AAAA", "MX"][rng.randrange(5)],
                "ResponseCode": rc,
                "QR": True,
                "Answers": answers,
            }
        )
    # edge cases
    base = dict(
        Timestamp=APP_TIME + 10,
        ServerIP="223.5.5.1",
        ClientIP="10.0.0.1",
        Domain="www.baidu.com",
        Type="A",
        ResponseCode=0,
        QR=True,
        Answers=[{"Type": "A", "Value": "8.8.8.8"}],
    )
    events += [
        {**base, "QR": False},  # filtered: request not response
        {**base, "Timestamp": APP_TIME - 1},  # filtered: before window
        {**base, "Timestamp": APP_TIME + WINDOW},  # filtered: after window
        {**base, "Domain": "host.localdomain"},  # filtered: junk
        {**base, "Domain": ""},  # filtered: empty
        {**base, "Answers": [{"Type": "A", "Value": "0.0.0.0"}]},  # error aip
        {**base, "Answers": [{"Type": "CNAME", "Value": "c.x.net"}]},  # no A
        {**base, "Domain": "http://www.qq.com"},  # scheme strip
    ]
    return events


def raw_lines(corrupt: bool = True) -> list[str]:
    lines = [json.dumps(e, ensure_ascii=False) for e in make_raw_events()]
    if corrupt:
        lines += ["{not json", "", "42"]
    return lines


JUNK_MARKERS = ["master01", ".localdomain", " ", "DHCP", "HOST", "Relteak", "getCached", "BlinkAP"]


def py_base_events() -> list[dict]:
    """Pure-python oracle: expected derived base events (deterministic
    aip = first A answer), mirroring sources.events.derive_events +
    operators.enrich.enrich_base."""
    out = []
    for e in make_raw_events():
        d = e["Domain"]
        if not e["QR"]:
            continue
        if d == "" or any(m in d for m in JUNK_MARKERS):
            continue
        if not (APP_TIME <= e["Timestamp"] < APP_TIME + WINDOW):
            continue
        answers = e["Answers"] or []
        a_recs = [a for a in answers if a["Type"] == "A"]
        aip = a_recs[0]["Value"] if a_recs else "0.0.0.0"
        rtype = answers[-1]["Type"] if answers else "other"
        error = 1 if (e["ResponseCode"] != 0 or not answers or aip == "0.0.0.0") else 0
        ipl = _ip2long(e["ClientIP"])
        client = next(
            (cid for lo, hi, cid in CLIENT_RULES if lo <= ipl <= hi), 5
        )
        aipl = _ip2long(aip)
        geo = next(
            (g for g in GEO if g[0] <= aipl <= g[1]), (0, 0, "", "", "", "")
        )
        out.append(
            dict(
                ts=e["Timestamp"],
                clientIp=e["ClientIP"],
                domain=d.replace("http://", "").replace("https://", ""),
                requestType=e["Type"],
                responseCode=e["ResponseCode"],
                responseType=rtype,
                dnsIp=e["ServerIP"],
                aip=aip,
                error=error,
                resolver=1,
                clientName=client,
                country=geo[2],
                province=geo[3],
                city=geo[4],
                operator=geo[5],
            )
        )
    return out


def _ip2long(ip: str) -> int:
    parts = ip.split(".")
    if len(parts) != 4:
        return 0
    try:
        v = 0
        for p in parts:
            v = (v << 8) | int(p)
        return v
    except ValueError:
        return 0


def build_dims(spark):
    from dnsflow_clickhouse_spark import schemas as S
    from dnsflow_clickhouse_spark.operators.enrich import EnrichDims

    return EnrichDims(
        client_rules=spark.createDataFrame(CLIENT_RULES, S.CLIENT_RULE_SCHEMA),
        media_rules=spark.createDataFrame(MEDIA_RULES, S.MEDIA_RULE_SCHEMA),
        segment_rules=spark.createDataFrame(
            SEGMENT_RULES,
            "min_long_ip long, max_long_ip long, resource_name string, resource_type string, resource_props string, rule_idx int",
        ),
        auth_domains=spark.createDataFrame(
            AUTH_DOMAINS,
            "authorityDomain string, companyName string, soft string, websiteName string, websiteType string, rule_idx int",
        ),
        geo=spark.createDataFrame(GEO, S.GEO_SCHEMA),
        whitelist=spark.createDataFrame([(d,) for d in WHITELIST], S.WHITELIST_SCHEMA),
        users=spark.createDataFrame(USERS, S.USER_SCHEMA),
        user_info=spark.createDataFrame(USER_INFO, S.USER_INFO_SCHEMA),
        domain_tags=spark.createDataFrame(DOMAIN_TAGS, S.DOMAIN_TAG_SCHEMA),
    )
