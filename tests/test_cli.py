"""Ad-hoc CLI: list/filter/unknown-name paths (no Spark session needed —
the run path is exercised by the registry itself)."""

from __future__ import annotations

from nosql_based_business_intelligence_system_spark.__main__ import main


def test_list_shows_oracle_kind(capsys):
    assert main(["--list", "fiscal_calendar"]) == 0
    out = capsys.readouterr().out
    assert "fiscal_calendar" in out and "oracle" in out


def test_list_filter_narrows(capsys):
    main(["--list", "asof"])
    out = capsys.readouterr().out.strip().splitlines()
    assert out and all("asof" in line for line in out)


def test_unknown_query_suggests(capsys):
    assert main(["fiscal_calenda"]) == 2
    err = capsys.readouterr().err
    assert "unknown query" in err and "fiscal_calendar" in err
