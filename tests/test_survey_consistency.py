"""SURVEY.md §2 is the judge's checklist — keep it honest: every query
name cited there exists in the catalog, and every catalog entry is
cited somewhere in SURVEY.md."""

from __future__ import annotations

import re

from miso_spark.catalog import CATALOG


def _survey_text() -> str:
    with open("SURVEY.md") as f:
        return f.read()


def test_survey_query_names_exist_in_catalog():
    cited = set(re.findall(r"`([a-z0-9_]+)`(?:,\s*`[a-z0-9_]+`)*", ""))
    text = _survey_text()
    cited = set()
    for m in re.finditer(r"q: ([^\n]+)", text):
        cited.update(re.findall(r"`([a-z0-9_]+)`", m.group(1)))
    missing = cited - set(CATALOG)
    assert not missing, f"SURVEY cites queries not in catalog: {missing}"


def test_catalog_entries_cited_in_survey():
    text = _survey_text()
    uncited = {name for name in CATALOG if f"`{name}`" not in text}
    assert not uncited, f"catalog queries not documented in SURVEY.md: {uncited}"


def test_every_query_runs_through_entry_contract():
    import __spark_entry__ as E

    qs = E.queries()
    assert set(qs) == set(CATALOG)
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # the correctness gate needs most entries oracle-backed
    assert len(oracles) >= len(qs) - 5
