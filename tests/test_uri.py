"""URI parser parity with the reference's Uri::Parse
(/root/reference/src/uri.hpp:13-81): protocol split, host/port split with
default ports 443 (wss/https) / 80 (ws/http), path defaulting to '/',
query split at '?', resource = path[?query]."""

from __future__ import annotations

import pytest

from ws_to_kafka_spark.uri import parse_uri


def test_wss_default_port():
    u = parse_uri("wss://ws.example.com/v2/")
    assert (u.protocol, u.host, u.port, u.path) == ("wss", "ws.example.com", 443, "/v2/")
    assert u.query_string == ""


def test_ws_default_port():
    assert parse_uri("ws://h/x").port == 80


def test_https_http_defaults():
    assert parse_uri("https://h").port == 443
    assert parse_uri("http://h").port == 80


def test_explicit_port_wins():
    u = parse_uri("wss://h:9443/p")
    assert u.port == 9443


def test_path_defaults_to_slash():
    # reference: src/uri.hpp:62-65 — empty path becomes "/"
    assert parse_uri("wss://h").path == "/"


def test_query_string_split():
    u = parse_uri("wss://h/p?a=1&b=2")
    assert u.path == "/p"
    assert u.query_string == "a=1&b=2"
    assert u.resource == "/p?a=1&b=2"


def test_resource_without_query():
    # reference joins path+query only when a query exists (src/uri.hpp:66-70)
    assert parse_uri("wss://h/p").resource == "/p"


def test_unknown_protocol_without_port_raises():
    with pytest.raises(ValueError):
        parse_uri("ftp://h/p")


def test_garbage_raises():
    with pytest.raises(ValueError):
        parse_uri("not a uri")
