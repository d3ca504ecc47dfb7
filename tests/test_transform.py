"""Golden tests for the transform DSL (SURVEY.md §5: golden-output
tests per function, expectations derived from VRL documented
semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from matano_spark.transform import (
    AbortIf,
    Assign,
    Delete,
    Fn,
    L,
    Move,
    P,
    When,
    compile_pipeline,
)
from matano_spark.transform import grok


def row(df):
    return df.collect()[0].asDict(recursive=True)


def test_assign_creates_nested_structs(spark):
    df = spark.createDataFrame([("x",)], ["raw"])
    out = compile_pipeline(
        [
            Assign("event.action", L("login")),
            Assign("event.outcome", L("failure")),
            Assign("user.name", P("raw")),
        ]
    )(df)
    r = row(out)
    assert r["event"] == {"action": "login", "outcome": "failure"}
    assert r["user"] == {"name": "x"}


def test_move_and_delete(spark):
    df = spark.createDataFrame([("a", "b")], ["keep", "temp"])
    out = compile_pipeline(
        [Move("renamed", "temp"), Delete("keep")]
    )(df)
    assert out.columns == ["renamed"]
    assert row(out) == {"renamed": "b"}


def test_abort_filters_rows(spark):
    df = spark.createDataFrame([(1, "ok"), (2, "skip")], ["id", "st"])
    out = compile_pipeline([AbortIf(P("st") == F.lit("skip"))])(df)
    assert [r.id for r in out.collect()] == [1]


def test_when_conditional_assign(spark):
    df = spark.createDataFrame([(5,), (15,)], ["v"])
    out = compile_pipeline(
        [
            When(
                P("v") >= F.lit(10),
                [Assign("sev", L("high"))],
                [Assign("sev", L("low"))],
            )
        ]
    )(df)
    assert [(r.v, r.sev) for r in out.collect()] == [(5, "low"), (15, "high")]


def test_missing_path_reads_null(spark):
    df = spark.createDataFrame([("x",)], ["a"])
    out = compile_pipeline([Assign("b", P("nope.deep.path"))])(df)
    assert row(out)["b"] is None


def test_casts_and_nullish(spark):
    df = spark.createDataFrame([("42", "oops", "  ", "7.5")], ["i", "bad", "ws", "f"])
    out = compile_pipeline(
        [
            Assign("vi", Fn("to_int", P("i"))),
            Assign("vbad", Fn("to_int", P("bad"))),
            Assign("vf", Fn("to_float", P("f"))),
            Assign("nullish", Fn("is_nullish", P("ws"))),
        ]
    )(df)
    r = row(out)
    assert r["vi"] == 42 and r["vbad"] is None
    assert r["vf"] == 7.5 and r["nullish"] is True


def test_to_timestamp_units(spark):
    df = spark.createDataFrame(
        [(1714567890, 1714567890123, "2024-05-01T12:34:56Z")], ["s", "ms", "iso"]
    )
    out = compile_pipeline(
        [
            Assign("ts_s", Fn("to_timestamp", P("s"))),
            Assign("ts_ms", Fn("to_timestamp", P("ms"), unit="milliseconds")),
            Assign("ts_iso", Fn("to_timestamp", P("iso"))),
        ]
    )(df)
    r = row(out)
    assert r["ts_s"] == dt.datetime(2024, 5, 1, 12, 51, 30)
    assert r["ts_ms"] == dt.datetime(2024, 5, 1, 12, 51, 30, 123000)
    assert r["ts_iso"] == dt.datetime(2024, 5, 1, 12, 34, 56)


def test_array_functions(spark):
    df = spark.createDataFrame([("a,b,a,,c",)], ["csv"])
    out = compile_pipeline(
        [
            Assign("arr", Fn("split", P("csv"), pattern=",")),
            Assign("arr", Fn("compact", P("arr"))),
            Assign("arr", Fn("unique", P("arr"))),
            Assign("arr", Fn("push", P("arr"), L("z"))),
            Assign("joined", Fn("join", P("arr"), separator="|")),
            Assign("n", Fn("length", P("arr"))),
            Assign("has_b", Fn("includes", P("arr"), L("b"))),
        ]
    )(df)
    r = row(out)
    assert r["arr"] == ["a", "b", "c", "z"]
    assert r["joined"] == "a|b|c|z"
    assert r["n"] == 4 and r["has_b"] is True


def test_parse_key_value_and_url(spark):
    df = spark.createDataFrame(
        [("k1=v1 k2=v2", "https://example.com:8443/p/q?x=1#frag")], ["kv", "url"]
    )
    out = compile_pipeline(
        [
            Assign("m", Fn("parse_key_value", P("kv"))),
            Assign("u", Fn("parse_url", P("url"))),
        ]
    )(df)
    r = row(out)
    assert r["m"] == {"k1": "v1", "k2": "v2"}
    assert r["u"]["scheme"] == "https"
    assert r["u"]["host"] == "example.com"
    assert r["u"]["port"] == 8443
    assert r["u"]["path"] == "/p/q"
    # VRL parse_url returns query as an OBJECT of decoded params
    assert r["u"]["query"] == {"x": "1"}
    assert r["u"]["fragment"] == "frag"


def test_grok_translate_and_parse(spark):
    regex, fields = grok.translate("^%{IP:ip} %{WORD:verb} %{NUMBER:code}$")
    assert [f for f, _ in fields] == ["ip", "verb", "code"]
    df = spark.createDataFrame(
        [("10.1.2.3 GET 200",), ("not a match",)], ["line"]
    )
    out = compile_pipeline(
        [
            Assign(
                "g", Fn("parse_grok", P("line"), pattern="^%{IP:ip} %{WORD:verb} %{NUMBER:code}$")
            )
        ]
    )(df)
    rows = [r.asDict(recursive=True)["g"] for r in out.collect()]
    assert rows[0] == {"ip": "10.1.2.3", "verb": "GET", "code": "200"}
    # no match -> NULL result (not a struct of null fields): the
    # `x, err = parse_grok(...)` idiom keys err on a null result
    assert rows[1] is None


def test_grok_dotted_fields_nest(spark):
    df = spark.createDataFrame([("10.0.0.1",)], ["addr"])
    out = compile_pipeline(
        [Assign("g", Fn("parse_grok", P("addr"), pattern="^%{IP:source.ip}$"))]
    )(df)
    assert row(out)["g"] == {"source": {"ip": "10.0.0.1"}}


def test_parse_vpcflow(spark):
    line = "2 123456789012 eni-0a1b2c3d 10.0.0.1 10.0.0.2 443 49152 6 10 8400 1714567800 1714567860 ACCEPT OK"
    df = spark.createDataFrame([(line,)], ["msg"])
    out = compile_pipeline([Assign("v", Fn("parse_aws_vpc_flow_log", P("msg")))])(df)
    v = row(out)["v"]
    assert v["version"] == 2
    assert v["srcaddr"] == "10.0.0.1"
    assert v["dstport"] == 49152
    assert v["bytes"] == 8400
    assert v["action"] == "ACCEPT"


def test_parse_user_agent(spark):
    """Woothee-shaped fast-mode goldens (Vector VRL parse_user_agent
    default): nested browser/device/os structs, marketing-name Windows
    mapping, underscore→dot iOS/macOS versions."""
    uas = [
        # desktop Chrome on Windows 10
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
        # Firefox on Linux (the Vector docs example)
        "Mozilla/5.0 (X11; Linux x86_64; rv:79.0) Gecko/20100101 Firefox/79.0",
        # mobile Safari on iPhone
        "Mozilla/5.0 (iPhone; CPU iPhone OS 14_6 like Mac OS X) "
        "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/14.1.1 "
        "Mobile/15E148 Safari/604.1",
        # desktop Safari on macOS
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
        "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.5 Safari/605.1.15",
        # Edge on Windows 7
        "Mozilla/5.0 (Windows NT 6.1; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/115.0.0.0 Safari/537.36 Edg/115.0.1901.183",
        # IE 11
        "Mozilla/5.0 (Windows NT 6.3; Trident/7.0; rv:11.0) like Gecko",
        # tool + crawler
        "curl/8.0.1",
        "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
    ]
    df = spark.createDataFrame([(u,) for u in uas], ["ua"])
    out = compile_pipeline([Assign("p", Fn("parse_user_agent", P("ua")))])(df)
    rows = [r.asDict(recursive=True)["p"] for r in out.collect()]
    assert rows[0] == {
        "browser": {"family": "Chrome", "version": "120.0.0.0"},
        "device": {"category": "pc"},
        "os": {"family": "Windows 10", "version": "NT 10.0"},
    }
    assert rows[1] == {
        "browser": {"family": "Firefox", "version": "79.0"},
        "device": {"category": "pc"},
        "os": {"family": "Linux", "version": None},
    }
    assert rows[2] == {
        "browser": {"family": "Safari", "version": "14.1.1"},
        "device": {"category": "smartphone"},
        "os": {"family": "iPhone", "version": "14.6"},
    }
    assert rows[3] == {
        "browser": {"family": "Safari", "version": "16.5"},
        "device": {"category": "pc"},
        "os": {"family": "Mac OSX", "version": "10.15.7"},
    }
    assert rows[4]["browser"] == {"family": "Edge", "version": "115.0.1901.183"}
    assert rows[4]["os"] == {"family": "Windows 7", "version": "NT 6.1"}
    assert rows[5]["browser"]["family"] == "Internet Explorer"
    assert rows[5]["browser"]["version"] == "11.0"
    assert rows[5]["os"]["family"] == "Windows 8.1"
    assert rows[6] == {
        "browser": {"family": "curl", "version": "8.0.1"},
        "device": {"category": "misc"},
        "os": {"family": None, "version": None},
    }
    assert rows[7]["browser"]["family"] == "Googlebot"
    assert rows[7]["device"]["category"] == "crawler"


def test_parse_user_agent_long_tail(spark):
    """Extended woothee-order goldens: named crawler sub-families,
    consoles ('appliance'), carrier feature phones ('mobilephone'),
    Windows Phone / BlackBerry / Samsung Internet smartphones, and
    HTTP-client tools — the UA shapes reachable from the reference's
    suricata eve.yml:573 / cloudflare http_request.yml:515 paths."""
    cases = [
        # (ua, family, category, os_family)
        (
            "Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)",
            "bingbot", "crawler", None,
        ),
        (
            "Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko; compatible; "
            "GPTBot/1.0; +https://openai.com/gptbot)",
            "GPTBot", "crawler", None,
        ),
        (
            "facebookexternalhit/1.1 (+http://www.facebook.com/externalhit_uatext.php)",
            "facebookexternalhit", "crawler", None,
        ),
        (
            "Mozilla/5.0 (compatible; SomethingNew/3.1; +http://x.example/info)",
            None, None, None,  # unknown stays null, no false browser hit
        ),
        (
            "ExampleCorp-Robot/2.0 (spider; admin@example.com)",
            "misc crawler", "crawler", None,
        ),
        (
            "Mozilla/5.0 (Nintendo Switch; WifiWebAuthApplet) AppleWebKit/606.4 "
            "(KHTML, like Gecko) NF/6.0.1.15.4 NintendoBrowser/5.1.0.20393",
            "Nintendo Switch", "appliance", "Nintendo Switch",
        ),
        (
            "Mozilla/5.0 (PlayStation 4 3.11) AppleWebKit/537.73 (KHTML, like Gecko)",
            "PlayStation 4", "appliance", "PlayStation 4",
        ),
        (
            "DoCoMo/2.0 P903i(c100;TB;W24H12)",
            "docomo", "mobilephone", "docomo",
        ),
        (
            "SoftBank/1.0/910T/TJ001/SN000000000000000 Browser/NetFront/3.3",
            "SoftBank", "mobilephone", "SoftBank",
        ),
        (
            "Mozilla/5.0 (compatible; MSIE 10.0; Windows Phone 8.0; Trident/6.0; "
            "IEMobile/10.0; ARM; Touch; NOKIA; Lumia 920)",
            "Internet Explorer", "smartphone", "Windows Phone OS",
        ),
        (
            "Mozilla/5.0 (BB10; Touch) AppleWebKit/537.10+ (KHTML, like Gecko) "
            "Version/10.0.9.2372 Mobile Safari/537.10+",
            "BlackBerry", "smartphone", "BlackBerry",
        ),
        (
            "Mozilla/5.0 (Linux; Android 13; SM-S918B) AppleWebKit/537.36 "
            "(KHTML, like Gecko) SamsungBrowser/21.0 Chrome/110.0.0.0 Mobile Safari/537.36",
            "Samsung Internet", "smartphone", "Android",
        ),
        (
            "PostmanRuntime/7.29.2",
            "PostmanRuntime", "misc", None,
        ),
        (
            "Apache-HttpClient/4.5.13 (Java/11.0.19)",
            "Apache-HttpClient", "misc", None,
        ),
        (
            "python-requests/2.28.1",
            "python-requests", "misc", None,
        ),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], ["ua"])
    out = compile_pipeline([Assign("p", Fn("parse_user_agent", P("ua")))])(df)
    rows = [r.asDict(recursive=True)["p"] for r in out.collect()]
    for (ua, fam, cat, osf), got in zip(cases, rows):
        assert got["browser"]["family"] == fam, (ua, got)
        assert got["device"]["category"] == cat, (ua, got)
        assert got["os"]["family"] == osf, (ua, got)
    # version extraction spot checks
    by_ua = dict(zip([u for u, *_ in cases], rows))
    assert by_ua["PostmanRuntime/7.29.2"]["browser"]["version"] == "7.29.2"
    assert (
        by_ua[cases[6][0]]["os"]["version"] == "3.11"  # PS4 firmware
    )
    assert by_ua[cases[9][0]]["browser"]["version"] == "10.0"  # IEMobile
    assert by_ua[cases[11][0]]["browser"]["version"] == "21.0"  # Samsung


def test_misc_functions(spark):
    df = spark.createDataFrame([("Hello World", 12, 10)], ["s", "a", "b"])
    out = compile_pipeline(
        [
            Assign("lo", Fn("downcase", P("s"))),
            Assign("and_", Fn("bitwise_and", P("a"), P("b"))),
            Assign("pos", Fn("find", P("s"), substring="World")),
            Assign("rep", Fn("replace", P("s"), pattern="l+", **{"with": "L", "regex": True})),
            Assign("m", Fn("match", P("s"), pattern="^Hello")),
        ]
    )(df)
    r = row(out)
    assert r["lo"] == "hello world"
    assert r["and_"] == 8
    assert r["pos"] == 6
    assert r["rep"] == "HeLo WorLd"
    assert r["m"] is True


def test_ecs_footer_style_pipeline(spark):
    """Mini CloudTrail-style end-to-end slice (FIXTURES.md B1):
    wrap/unwrap + grok + related.ip push + ecs.version stamp."""
    df = spark.createDataFrame(
        [("10.1.2.3", "GetObject", "s3.amazonaws.com", "2024-05-01T12:34:56Z")],
        ["sourceIPAddress", "eventName", "eventSource", "eventTime"],
    )
    pipeline = compile_pipeline(
        [
            Assign("ts", Fn("to_timestamp", P("eventTime"))),
            Assign("event.action", P("eventName")),
            Assign("event.provider", P("eventSource")),
            Assign("source.address", P("sourceIPAddress")),
            When(
                Fn("is_ipv4", P("sourceIPAddress")),
                [Assign("source.ip", P("sourceIPAddress"))],
            ),
            Assign("related.ip", Fn("push", P("related.ip"), P("source.ip"))),
            Delete("eventTime"),
            Delete("eventName"),
            Delete("eventSource"),
            Delete("sourceIPAddress"),
            Assign("ecs.version", L("8.5.0")),
        ]
    )
    r = row(pipeline(df))
    assert r["ts"] == dt.datetime(2024, 5, 1, 12, 34, 56)
    assert r["event"] == {"action": "GetObject", "provider": "s3.amazonaws.com"}
    assert r["source"] == {"address": "10.1.2.3", "ip": "10.1.2.3"}
    assert r["related"] == {"ip": ["10.1.2.3"]}
    assert r["ecs"] == {"version": "8.5.0"}
    assert sorted(pipeline(df).columns) == ["ecs", "event", "related", "source", "ts"]


def test_compact_rows_recursive(spark):
    from matano_spark.transform.functions import compact_rows

    df = spark.createDataFrame(
        [
            ("", ["a", "", None], ("", None)),
            ("x", [], ("y", "z")),
        ],
        "s string, arr array<string>, st struct<a:string, b:string>",
    )
    rows = [r.asDict(recursive=True) for r in compact_rows(df).collect()]
    assert rows[0] == {"s": None, "arr": ["a"], "st": None}  # all-empty struct → null
    assert rows[1] == {"s": "x", "arr": None, "st": {"a": "y", "b": "z"}}


def test_remaining_scalar_functions(spark):
    df = spark.createDataFrame(
        [("05/01/2024 12:30:45", "2024-05-01T10:00:00Z",
          'a,"b,c",d', "[[1,2],[3]]", "hello")],
        ["fmt_ts", "iso", "csvline", "nested", "s"],
    )
    out = compile_pipeline(
        [
            Assign("p1", Fn("parse_timestamp", P("fmt_ts"), format="%m/%d/%Y %H:%M:%S")),
            Assign("unix_s", Fn("to_unix_timestamp", Fn("parse_timestamp", P("iso")))),
            Assign("m_any", Fn("match_any", P("s"), patterns=["^x", "ell"])),
            Assign("trunc", Fn("truncate", P("s"), limit=3)),
            Assign("csv", Fn("parse_csv", P("csvline"))),
            Assign("j", Fn("encode_json", P("csvline"))),
            Assign("sliced", Fn("slice", P("s"), start=1, end=4)),
            Assign("ua_exists", Fn("exists", P("s"))),
        ]
    )(df)
    r = row(out)
    assert r["p1"] == dt.datetime(2024, 5, 1, 12, 30, 45)
    assert r["unix_s"] == 1714557600
    assert r["m_any"] is True
    assert r["trunc"] == "hel"
    assert r["csv"] == ["a", "b,c", "d"]
    assert r["j"] == '"a,\\"b,c\\",d"'
    assert r["sliced"] == "ell"
    assert r["ua_exists"] is True


def test_merge_and_flatten_and_parse_json(spark):
    from pyspark.sql import types as TT

    df = spark.createDataFrame(
        [((1, "x"), ("y", 2.0), '{"a": {"b": 5}}')],
        "s1 struct<i:long, s:string>, s2 struct<s:string, d:double>, js string",
    )
    schema = TT.StructType(
        [TT.StructField("a", TT.StructType([TT.StructField("b", TT.LongType())]))]
    )
    out = compile_pipeline(
        [
            Assign("merged", Fn("merge", P("s1"), P("s2"))),
            Assign("parsed", Fn("parse_json", P("js"), schema=schema)),
            Assign("b_val", P("parsed.a.b")),
        ]
    )(df)
    r = row(out)
    assert r["merged"] == {"i": 1, "s": "y", "d": 2.0}  # right side wins on s
    assert r["parsed"] == {"a": {"b": 5}}
    assert r["b_val"] == 5


def test_ip_functions(spark):
    df = spark.createDataFrame(
        [("10.1.2.3",), ("10.200.0.1",), ("192.168.1.5",), ("not-an-ip",)],
        ["ip"],
    )
    out = compile_pipeline(
        [
            Assign("n", Fn("ip_to_long", P("ip"))),
            Assign("in_10_8", Fn("ip_cidr_contains", P("ip"), cidr="10.0.0.0/8")),
            Assign("in_10_1_16", Fn("ip_cidr_contains", P("ip"), cidr="10.1.0.0/16")),
        ]
    )(df)
    rows = {r.ip: (r.n, r.in_10_8, r.in_10_1_16) for r in out.collect()}
    assert rows["10.1.2.3"] == (10 * 16777216 + 1 * 65536 + 2 * 256 + 3, True, True)
    assert rows["10.200.0.1"][1:] == (True, False)
    assert rows["192.168.1.5"][1:] == (False, False)
    assert rows["not-an-ip"] == (None, False, False)


def test_enrich_step_mid_pipeline(spark):
    """get_enrichment_table_record inside a transform program (J1 in
    the DSL): lookup joins between projection stages; post-join steps
    read the bound record."""
    from matano_spark.transform import Enrich

    kev = spark.createDataFrame(
        [("CVE-2021-44228", "Apache", "Log4j")], ["cve_id", "vendor", "product"]
    )
    df = spark.createDataFrame(
        [("h1", "cve-2021-44228"), ("h2", "cve-0000-0000")], ["host", "raw_cve"]
    )
    pipeline = compile_pipeline(
        [
            Assign("vuln.id", Fn("upcase", P("raw_cve"))),
            Delete("raw_cve"),
            Enrich("kev", kev, on={"vuln.id": "cve_id"}, select=("vendor", "product")),
            Assign("known_exploited", Fn("exists", P("kev"))),
            When(
                P("known_exploited"),
                [Assign("severity", L("critical"))],
                [Assign("severity", L("unknown"))],
            ),
        ]
    )
    rows = {r["host"]: r.asDict(recursive=True) for r in pipeline(df).collect()}
    assert rows["h1"]["kev"] == {"vendor": "Apache", "product": "Log4j"}
    assert rows["h1"]["severity"] == "critical"
    assert rows["h2"]["kev"] is None
    assert rows["h2"]["severity"] == "unknown"


def test_hash_and_format_functions(spark):
    df = spark.createDataFrame([("abc", dt.datetime(2024, 5, 1, 12, 30))], ["s", "t"])
    out = compile_pipeline(
        [
            Assign("h_md5", Fn("md5", P("s"))),
            Assign("h_sha1", Fn("sha1", P("s"))),
            Assign("h_sha256", Fn("sha2", P("s"))),
            Assign("fmt", Fn("format_timestamp", P("t"), format="%Y/%m/%d %H:%M")),
        ]
    )(df)
    r = row(out)
    assert r["h_md5"] == "900150983cd24fb0d6963f7d28e17f72"
    assert r["h_sha1"] == "a9993e364706816aba3e25717850c26c9cd0d89d"
    assert r["h_sha256"].startswith("ba7816bf8f01cfea")
    assert r["fmt"] == "2024/05/01 12:30"


def test_new_scalar_functions(spark):
    df = spark.createDataFrame(
        [("hello", "aGVsbG8=", "ff", "250ms", "cba",
          "<34>Oct 11 22:14:15 host1 su[123]: auth failure for root")],
        ["s", "b64", "hexv", "dur", "rev", "syslog"],
    )
    out = compile_pipeline(
        [
            Assign("enc", Fn("encode_base64", P("s"))),
            Assign("dec", Fn("decode_base64", P("b64"))),
            Assign("hx", Fn("parse_int", P("hexv"), base=16)),
            Assign("bad_hex", Fn("parse_int", L("zz"), base=16)),
            Assign("r", Fn("reverse", P("rev"))),
            Assign("srt", Fn("sort", Fn("split", P("rev"), pattern=""))),
            Assign("ms", Fn("parse_duration", P("dur"), unit="ms")),
            Assign("secs", Fn("parse_duration", P("dur"))),
            Assign("sl", Fn("parse_syslog", P("syslog"))),
        ]
    )(df)
    r = row(out)
    assert r["enc"] == "aGVsbG8="
    assert r["dec"] == "hello"
    assert r["hx"] == 255
    assert r["bad_hex"] is None
    assert r["r"] == "abc"
    assert r["srt"] == ["a", "b", "c"]
    assert r["ms"] == 250.0
    assert r["secs"] == 0.25
    assert r["sl"]["priority"] == 34
    assert r["sl"]["facility"] == 4
    assert r["sl"]["severity"] == 2
    assert r["sl"]["hostname"] == "host1"
    assert r["sl"]["appname"] == "su"
    assert r["sl"]["procid"] == 123
    assert r["sl"]["message"] == "auth failure for root"


def test_parse_syslog_no_pid_and_invalid(spark):
    df = spark.createDataFrame(
        [("<13>Feb  5 01:02:03 web nginx: started", "not syslog at all")],
        ["ok", "bad"],
    )
    out = compile_pipeline(
        [
            Assign("a", Fn("parse_syslog", P("ok"))),
            Assign("b", Fn("parse_syslog", P("bad"))),
        ]
    )(df)
    r = row(out)
    assert r["a"]["appname"] == "nginx" and r["a"]["procid"] is None
    assert r["a"]["message"] == "started"
    assert r["b"]["priority"] is None and r["b"]["hostname"] is None
