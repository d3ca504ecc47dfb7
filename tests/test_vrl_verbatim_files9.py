"""Round-8 verbatim full-file executions, batch 9: zeek x509 (the
sig-alg lookup map + exponent/serial unflatten), ssh (auth outcome),
ntlm, weird — closing out the zeek protocol-log shapes.

Reference programs: /root/reference/data/managed/log_sources/zeek/tables/*.yml"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from matano_spark.transform.parser import compile_vrl

REF_MANAGED = "/root/reference/data/managed/log_sources"

# Full-reference verbatim compiles take 30-90s EACH; tiered out of the
# default selection (pytest.ini deselects -m slow) so the suite fits
# the driver's window. Run them with: pytest -m slow tests/
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(REF_MANAGED), reason="reference tree not present"
)]


def _load_transform(rel_yml: str) -> str:
    from tools.vrl_parse_survey import iter_programs

    path = os.path.join(REF_MANAGED, rel_yml)
    for p, kind, prog in iter_programs(os.path.dirname(path)):
        if p == path and kind == "transform":
            return prog
    raise AssertionError(f"no transform block in {rel_yml}")


def _run(spark, rel_yml: str, event: dict) -> dict:
    prog = _load_transform(rel_yml)
    inferred = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(event)], 1)
    )
    df = spark.createDataFrame([(json.dumps(event),)], "message string").crossJoin(
        inferred.select(
            F.struct(*[F.col(f"`{c}`") for c in inferred.columns]).alias("json")
        ).limit(1)
    )
    out = compile_vrl(prog)(df)
    rows = out.collect()
    assert rows, f"{rel_yml}: event fell into an abort branch"
    return _norm(rows[0].asDict(recursive=True))


def _norm(v):
    from pyspark.sql.types import VariantVal

    if isinstance(v, VariantVal):
        return _norm(json.loads(v.toJson()))
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    return v


def _ts_utc(v):
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            return v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v
    return v


def _s(v):
    return str(v).strip('"')


def test_zeek_x509_full_transform_verbatim(spark):
    event = {
        "ts": 1717200000.0,
        "id": "Fx509abc",
        "certificate.version": 3,
        "certificate.serial": "0A1B2C3D",
        "certificate.subject": "CN=svc.example.com,O=Example Corp",
        "certificate.issuer": "CN=Example CA,O=Example CA Org",
        "certificate.not_valid_before": 1700000000.0,
        "certificate.not_valid_after": 1760000000.0,
        "certificate.key_alg": "rsaEncryption",
        "certificate.sig_alg": "sha256WithRSAEncryption",
        "certificate.key_type": "rsa",
        "certificate.key_length": 2048,
        "certificate.exponent": "65537",
        "certificate.cn": "svc.example.com",
        "basic_constraints.path_len": 0,
        "san.dns": ["svc.example.com", "alt.example.com"],
    }
    d = _run(spark, "zeek/tables/x509.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200000)
    assert _s(d["event"]["id"]) == "Fx509abc"
    fx = d["file"]["x509"]
    # sig_alg_map lookup rewrites the OID-style name
    assert _s(fx["signature_algorithm"]) == "SHA256-RSA"
    assert _s(fx["public_key_algorithm"]) == "rsaEncryption"
    assert fx["public_key_size"] == 2048
    assert fx["public_key_exponent"] == 65537
    assert _s(fx["serial_number"]) == "0A1B2C3D"
    assert _s(fx["version_number"]) == "3"
    zx = d["zeek"]["x509"]
    assert _s(zx["certificate"]["common_name"]) == "svc.example.com"
    # sub/iss are TEMPS the reference deletes after parse_key_value
    # (x509.yml `del(.zeek.x509.certificate.sub)`); the parsed DN
    # fields land under file.x509.subject/issuer as per-field arrays
    cert = zx["certificate"]
    assert "sub" not in cert or cert.get("sub") is None
    assert "iss" not in cert or cert.get("iss") is None
    subj = d["file"]["x509"]["subject"]
    assert [_s(x) for x in subj["common_name"]] == ["svc.example.com"]
    assert [_s(x) for x in subj["organization"]] == ["Example Corp"]
    iss = d["file"]["x509"]["issuer"]
    assert [_s(x) for x in iss["common_name"]] == ["Example CA"]
    assert [_s(x) for x in iss["organization"]] == ["Example CA Org"]
    assert zx["basic_constraints"]["path_length"] == 0


def test_zeek_ssh_full_transform_verbatim(spark):
    event = {
        "ts": 1717200000.0,
        "uid": "CXssh1",
        "id.orig_h": "10.0.0.11",
        "id.orig_p": 55000,
        "id.resp_h": "192.0.2.22",
        "id.resp_p": 22,
        "version": 2,
        "auth_success": False,
        "auth_attempts": 3,
        "client": "SSH-2.0-OpenSSH_9.6",
        "server": "SSH-2.0-OpenSSH_8.9p1",
        "cipher_alg": "chacha20-poly1305@openssh.com",
        "mac_alg": "umac-64-etm@openssh.com",
        "compression_alg": "none",
        "kex_alg": "curve25519-sha256",
        "host_key_alg": "ssh-ed25519",
    }
    d = _run(spark, "zeek/tables/ssh.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200000)
    assert _s(d["network"]["protocol"]) == "ssh"
    assert _s(d["event"]["id"]) == "CXssh1"
    assert d["event"]["outcome"] == "failure"  # auth_success false
    assert _s(d["source"]["ip"]) == "10.0.0.11"
    assert d["source"]["port"] == 55000
    assert _s(d["destination"]["ip"]) == "192.0.2.22"
    assert d["destination"]["port"] == 22
    zs = d["zeek"]["ssh"]
    assert zs["auth"]["attempts"] == 3
    assert zs["auth"]["success"] is False
    assert _s(zs["algorithm"]["cipher"]) == "chacha20-poly1305@openssh.com"
    assert _s(zs["algorithm"]["key_exchange"]) == "curve25519-sha256"
    assert _s(zs["algorithm"]["host_key"]) == "ssh-ed25519"
    assert _s(zs["client"]) == "SSH-2.0-OpenSSH_9.6"
    assert {_s(i) for i in d["related"]["ip"]} == {"10.0.0.11", "192.0.2.22"}


def test_zeek_ntlm_full_transform_verbatim(spark):
    event = {
        "ts": 1717200000.0,
        "uid": "CXntlm1",
        "id.orig_h": "10.0.0.12",
        "id.orig_p": 56000,
        "id.resp_h": "192.0.2.44",
        "id.resp_p": 445,
        "username": "alice",
        "hostname": "WS01",
        "domainname": "CORP",
        "server_dns_computer_name": "dc1.corp.example.com",
        "server_nb_computer_name": "DC1",
        "server_tree_name": "corp.example.com",
        "success": True,
    }
    d = _run(spark, "zeek/tables/ntlm.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200000)
    assert set(d["event"]["category"]) == {"network", "authentication"}
    assert _s(d["network"]["protocol"]) == "ntlm"
    assert d["event"]["outcome"] == "success"
    assert _s(d["user"]["name"]) == "alice"
    assert _s(d["user"]["domain"]) == "CORP"
    zn = d["zeek"]["ntlm"]
    assert _s(zn["domain"]) == "CORP"
    assert _s(zn["server"]["name"]["dns"]) == "dc1.corp.example.com"
    assert _s(zn["server"]["name"]["netbios"]) == "DC1"
    assert _s(zn["server"]["name"]["tree"]) == "corp.example.com"
    assert [_s(u) for u in d["related"]["user"] if u is not None] == ["alice"]
    assert {_s(i) for i in d["related"]["ip"]} == {"10.0.0.12", "192.0.2.44"}


def test_zeek_weird_full_transform_verbatim(spark):
    event = {
        "ts": 1717200000.0,
        "uid": "CXweird1",
        "id.orig_h": "10.0.0.13",
        "id.orig_p": 57000,
        "id.resp_h": "192.0.2.55",
        "id.resp_p": 80,
        "name": "bad_HTTP_request",
        "addl": "truncated header",
        "notice": False,
        "peer": "worker-1",
    }
    d = _run(spark, "zeek/tables/weird.yml", event)
    assert _ts_utc(d["ts"]) == dt.datetime.utcfromtimestamp(1717200000)
    assert _s(d["event"]["id"]) == "CXweird1"
    assert _s(d["rule"]["name"]) == "bad_HTTP_request"
    zw = d["zeek"]["weird"]
    assert _s(zw["additional_info"]) == "truncated header"
    assert zw["notice"] is False
    assert _s(zw["peer"]) == "worker-1"
    assert _s(d["source"]["ip"]) == "10.0.0.13"
    assert _s(d["destination"]["ip"]) == "192.0.2.55"
    assert {_s(i) for i in d["related"]["ip"]} == {"10.0.0.13", "192.0.2.55"}