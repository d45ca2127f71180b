"""Doc-vs-artifact consistency: every performance number quoted in the
benchmark sections of PARITY.md and README.md must trace to a committed
artifact — a ``BENCH_r*.json`` driver/builder capture or a
``PERF_RECORD.jsonl`` ledger row (backfilled for rounds 2-4 prose;
appended by ``tool/perf_report.py`` at measurement time from round 5).

Round-4 advisor finding this automates: PARITY quoted healthy-window
ranges (5.15-6.00) that contradicted the committed BENCH_r04_builder.json
(actual 5.03-6.00). The targeted check below re-derives quoted
healthy-window ranges from the cited artifact.
"""

import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOL = 0.006  # quoted numbers are rounded to <= 2 decimals


def _artifact_numbers(rec):
    """Numbers a capture licenses for quotation (rounded forms), split
    into throughput values (``rate``: the capture value + its windows)
    and everything else (``other``: link probes, spreads, counts) — an
    img/s quote must NOT be licensed by a link-MB/s coincidence."""
    rate, other = set(), set()

    def add(pool, v):
        pool.add(round(float(v), 2))
        pool.add(round(float(v), 1))

    if "parsed" in rec:
        rec = rec["parsed"]
    if "value" in rec:
        add(rate, rec["value"])
    for key in ("vs_baseline", "window_spread",
                "healthy_window_spread", "link_MB_per_s", "n_healthy"):
        if key in rec:
            add(other, rec[key])
            if key.endswith("spread"):
                add(other, rec[key] * 100)  # quoted as percent
    windows = rec.get("windows", [])
    for w in windows:
        add(rate, w)
    for li in rec.get("window_links_MB_per_s", []):
        add(other, li)
    healthy = rec.get("window_healthy")
    if windows:
        add(rate, min(windows)), add(rate, max(windows))
        if healthy:
            hs = [w for w, h in zip(windows, healthy) if h]
            ds = [w for w, h in zip(windows, healthy) if not h]
            for sub in (hs, ds):
                if sub:
                    add(rate, min(sub)), add(rate, max(sub))
            ls = rec.get("window_links_MB_per_s")
            if ls:
                dl = [li for li, h in zip(ls, healthy) if not h]
                if dl:
                    add(other, min(dl)), add(other, max(dl))
    return rate, other


def _load_artifacts():
    arts = {}
    for path in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        with open(path) as f:
            arts[os.path.basename(path)] = _artifact_numbers(json.load(f))
    return arts


def _ledger_numbers(rates_only=False):
    vals = set()
    with open(os.path.join(ROOT, "PERF_RECORD.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rates_only and "img/s" not in rec.get("unit", ""):
                continue
            vals.add(round(float(rec["value"]), 2))
            vals.add(round(float(rec["value"]), 1))
            if not rates_only:
                continue
            # a ledger capture's per-window rates are quotable too
            for w in rec.get("windows", []):
                vals.add(round(float(w), 2))
                vals.add(round(float(w), 1))
    return vals


def _section(path, heading):
    out, on = [], False
    with open(os.path.join(ROOT, path)) as f:
        for line in f:
            if line.startswith(heading):
                on = True
                continue
            if on and line.startswith("## "):
                break
            if on:
                out.append(line.rstrip("\n"))
    assert out, f"{heading!r} not found in {path}"
    return out


SECTIONS = [
    ("PARITY.md", "## Benchmarks"),
    ("README.md", "## Measured performance"),
]


def _licensed_rates():
    vals = _ledger_numbers(rates_only=True)
    for rate, _other in _load_artifacts().values():
        vals |= rate
    return vals


def _ok(x, licensed):
    return any(abs(x - v) <= TOL for v in licensed)


@pytest.mark.parametrize("path,heading", SECTIONS)
def test_quoted_img_per_s_numbers_are_recorded(path, heading):
    licensed = _licensed_rates()
    bad = []
    for line in _section(path, heading):
        for m in re.finditer(r"(\d+(?:\.\d+)?)(?:\s|&nbsp;)?img/s", line):
            x = float(m.group(1))
            if not _ok(x, licensed):
                bad.append((x, line[:80]))
        for m in re.finditer(r"(\d+\.\d+)[–-](\d+\.\d+)\s?img/s", line):
            for g in m.groups():
                if not _ok(float(g), licensed):
                    bad.append((float(g), line[:80]))
    assert not bad, (
        "perf numbers quoted without a committed artifact/ledger row "
        f"(add the measurement to PERF_RECORD.jsonl): {bad}"
    )


def test_artifact_citing_ranges_match_cited_artifact():
    """Any 'A–B' range on a line that cites BENCH artifacts must be
    derivable from those artifacts (window/link extremes) or the ledger."""
    arts = _load_artifacts()
    ledger = _ledger_numbers()
    bad = []
    for path, heading in SECTIONS:
        for line in _section(path, heading):
            cited = set()
            for name in re.findall(r"BENCH_r\d+[\w*]*\.json", line):
                for art in arts:
                    if re.fullmatch(name.replace("*", r"[\w]*"), art):
                        cited.add(art)
            if not cited:
                continue
            licensed = set(ledger)
            for art in cited:
                rate, other = arts[art]
                licensed |= rate | other
            for m in re.finditer(r"(\d+\.\d+)[–-](\d+\.\d+)", line):
                for g in m.groups():
                    if not _ok(float(g), licensed):
                        bad.append((float(g), sorted(cited), line[:80]))
    assert not bad, f"range endpoints contradict the cited artifact: {bad}"


def test_healthy_window_claims_match_builder_artifact():
    """The precise advisor-class check: 'median of N healthy windows
    (A–B' next to a BENCH_r04* citation must equal the artifact's
    n_healthy and healthy-window extremes."""
    with open(os.path.join(ROOT, "BENCH_r04_builder.json")) as f:
        rec = json.load(f)
    hs = [w for w, h in zip(rec["windows"], rec["window_healthy"]) if h]
    for path, heading in SECTIONS:
        for line in _section(path, heading):
            if "BENCH_r04" not in line:
                continue
            m = re.search(
                r"median of (\d+) healthy windows \((\d+\.\d+)[–-](\d+\.\d+)",
                line,
            )
            if not m:
                continue
            n, lo, hi = int(m.group(1)), float(m.group(2)), float(m.group(3))
            assert n == rec["n_healthy"], line[:80]
            assert abs(lo - min(hs)) <= TOL, (lo, min(hs), line[:80])
            assert abs(hi - max(hs)) <= TOL, (hi, max(hs), line[:80])
