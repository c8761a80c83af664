"""Rule-matching semantics — ports the reference's config_matching_tests.rs
(4 cases, src/tests/config_matching_tests.rs:7-72) plus rebuild additions."""

from __future__ import annotations

import pytest

from data_ingestion_spark.errors import ConfigError
from data_ingestion_spark.rules import (
    DEFAULT_RULES,
    IngestionConfigRule,
    RuleSet,
    rules_from_dicts,
)


def rs(*pairs):
    return RuleSet([IngestionConfigRule(p, t) for p, t in pairs])


def test_specific_pattern_beats_general():
    # config_matching_tests.rs:27-47 — longest pattern wins
    rules = rs((r".*\.csv$", "csv_data"), (r".*test_no_headers\.csv$", "csv_no_headers_data"))
    assert rules.match("uploads/test_no_headers.csv").target_table == "csv_no_headers_data"


def test_general_fallback():
    rules = rs((r".*\.csv$", "csv_data"), (r".*test_no_headers\.csv$", "csv_no_headers_data"))
    assert rules.match("uploads/regular.csv").target_table == "csv_data"


def test_no_match_returns_none():
    rules = rs((r".*\.csv$", "csv_data"))
    assert rules.match("document.pdf") is None
    with pytest.raises(ConfigError, match="No configuration found"):
        rules.match_or_raise("document.pdf")


def test_path_scoped_pattern():
    # config_matching_tests.rs:49-72 — reports/.*\.xlsx$ scoping
    rules = rs((r".*\.xlsx?$", "excel_data"), (r"reports/.*\.xlsx$", "excel_reports"))
    assert rules.match("reports/q3.xlsx").target_table == "excel_reports"
    assert rules.match("misc/q3.xlsx").target_table == "excel_data"


def test_search_not_fullmatch():
    # reference uses Regex::is_match (search semantics) on the whole key
    rules = rs((r"\.csv$", "csv_data"))
    assert rules.match("deep/path/file.csv").target_table == "csv_data"


def test_default_rules_cover_reference_seeds():
    # migration.js:5-51 routing expectations
    cases = {
        "data/file.csv": "csv_data",
        "x/test_no_headers.csv": "csv_no_headers_data",
        "data/file.json": "json_data",
        "reports/q1.xlsx": "excel_reports",
        "other/q1.xlsx": "excel_data",
        "logs/app.txt": "text_logs",
        "data/file.xml": "xml_data",
    }
    for key, table in cases.items():
        assert DEFAULT_RULES.match(key).target_table == table, key


def test_parser_config_json_string_reparsed():
    # documentdb/config_repo.rs:42-43 stores parser_config as a JSON string
    rules = rules_from_dicts(
        [{"pattern": r".*\.csv$", "target_table": "t", "parser_config": '{"headers": ["a"]}'}]
    )
    assert rules.match("f.csv").parser_config == {"headers": ["a"]}
