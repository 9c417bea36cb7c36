"""Deterministic traffic-domain fixtures + an independent pure-Python oracle.

The generator writes the reference's on-disk CSV contract (FIXTURES.md §A):
``speed_base.csv``, ``TF_ZFZD_CASESPECIFICATION.csv`` and per-month
``YYYYMM/YYYYMM{CSYDATA,SFZDATA}.csv`` for 201606-201612, seeded and
deterministic, including malformed rows, empty fields, unparseable
timestamps, boundary instants, duplicate tuples and exact-threshold speeds.

The oracle re-implements the REFERENCE semantics (not the engine's code) in
plain Python: Java ``split(",")`` trailing-empty truncation, arity filters,
lenient parses with 0-defaults, epoch-sentinel timestamps, per-month closed /
half-open ranges, per-month interval joins, UNION-DISTINCT-only-when-
multi-month, and the 4-segment aggregates — so engine vs oracle agreement is
evidence of parity, not of shared bugs.

All timestamps are treated as UTC (the engine pins
``spark.sql.session.timeZone=UTC`` in tests).
"""

from __future__ import annotations

import datetime as dt
import random
from collections import Counter, defaultdict
from pathlib import Path

UTC = dt.timezone.utc
MONTHS = ["201606", "201607", "201608", "201609", "201610", "201611", "201612"]
TS_FMT = "%Y-%m-%d %H:%M:%S"


def _millis(d: dt.datetime) -> int:
    return int(d.replace(tzinfo=UTC).timestamp() * 1000)


def _month_start(mm: str) -> dt.datetime:
    return dt.datetime(int(mm[:4]), int(mm[4:]), 1)


def _next_month(mm: str) -> str:
    y, m = int(mm[:4]), int(mm[4:])
    m += 1
    if m == 13:
        y, m = y + 1, 1
    return f"{y:04d}{m:02d}"


# --- generation ---------------------------------------------------------------


def generate(base: Path, seed: int = 42, scale: int = 1, hot_plate: int = 0) -> None:
    """Write the reference-layout CSV corpus under ``base``.

    ``scale`` multiplies the per-month trip/observation/accident row counts
    (edge-case rows stay single) — scale=1 for the correctness tests, larger
    for bench fixtures.  The Python oracles below read whatever is on disk,
    so they stay correct at any scale.

    ``hot_plate`` > 0 adds a single skewed plate ``PHOT0`` carrying
    ``50*hot_plate`` extra trips and ``400*hot_plate`` extra observations
    per month — a deliberately hot join key for skew tests (the toll join
    keys on plate, so one plate concentrating traffic is THE skew shape the
    reference's data would hit at scale).  ``hot_plate=0`` (default) draws
    nothing extra from the RNG: fixtures are byte-identical to before."""
    rng = random.Random(seed)
    base.mkdir(parents=True, exist_ok=True)

    # stations: S000..S059; lon 115-120, lat 35-41; edges of the canonical
    # bbox (116/118, 36/39) included; a few empty-coordinate rows; malformed.
    station_lines = []
    for i in range(60):
        guid = f"S{i:03d}"
        if i < 4:  # exact bbox edges
            lon = [116.0, 118.0, 116.5, 117.0][i]
            lat = [36.0, 39.0, 36.5, 38.0][i]
        else:
            lon = round(rng.uniform(115.0, 120.0), 6)
            lat = round(rng.uniform(35.0, 41.0), 6)
        station_lines.append(
            f"G{i % 5},Z{i:04d},{guid},D{i % 2},Station{i},J{i},{lon},{lat}"
        )
    station_lines.append("G9,Z9999,S900,D0,NoCoord,J9,,")  # empty lon/lat -> trailing-comma arity drop
    station_lines.append("G9,Z9998,S901,D0,NoLat,J9,117.2,")  # trailing empty -> arity drop
    station_lines.append("G9,Z9997,S902,D0,EmptyLon,J9,,37.5")  # interior empty lon -> len>0 drop
    station_lines.append("short,row")  # arity drop
    (base / "speed_base.csv").write_text("\n".join(station_lines) + "\n")

    plates = [f"P{i:04d}" for i in range(200)]

    for mm in MONTHS:
        mdir = base / mm
        mdir.mkdir(exist_ok=True)
        m_start = _month_start(mm)
        m_next = _month_start(_next_month(mm))
        m_secs = int((m_next - m_start).total_seconds())

        # --- toll trips
        fee_lines = []
        trips = []  # (plate, en_dt, ex_dt, cls, flag) for speed-row correlation
        for t in range(300 * scale):
            plate = rng.choice(plates)
            en = m_start + dt.timedelta(seconds=rng.randrange(m_secs - 6 * 3600))
            ex = en + dt.timedelta(seconds=rng.randrange(1800, 6 * 3600))
            cls = str(rng.randint(1, 4))
            flag = str(rng.randint(0, 1))
            ex_plate = plate if rng.random() > 0.05 else rng.choice(plates)
            fee_lines.append(
                f"EX{t % 20},{ex.strftime(TS_FMT)},EN{t % 20},{en.strftime(TS_FMT)},"
                f"{cls},{plate},{ex_plate},{flag}"
            )
            trips.append((plate, en, ex, cls, flag))
        # hot-plate trips (skew tests): one plate, many concurrent trips
        for t in range(50 * hot_plate):
            en = m_start + dt.timedelta(seconds=rng.randrange(m_secs - 6 * 3600))
            ex = en + dt.timedelta(seconds=rng.randrange(1800, 6 * 3600))
            cls = str(rng.randint(1, 4))
            flag = str(rng.randint(0, 1))
            fee_lines.append(
                f"EXH{t % 20},{ex.strftime(TS_FMT)},ENH{t % 20},{en.strftime(TS_FMT)},"
                f"{cls},PHOT0,PHOT0,{flag}"
            )
            trips.append(("PHOT0", en, ex, cls, flag))
        # a trip spanning into the next month (boundary semantics)
        en = m_next - dt.timedelta(hours=2)
        ex = m_next + dt.timedelta(hours=3)
        fee_lines.append(
            f"EX0,{ex.strftime(TS_FMT)},EN0,{en.strftime(TS_FMT)},2,PB{mm},PB{mm},1"
        )
        trips.append(("PB" + mm, en, ex, "2", "1"))
        # malformed / sentinel rows
        fee_lines.append(f"EX1,bad-ts,EN1,{m_start.strftime(TS_FMT)},1,P0001,P0001,0")
        fee_lines.append(f"EX1,{m_start.strftime(TS_FMT)},EN1,,1,P0002,P0002,0")
        fee_lines.append("too,short,row")
        (mdir / f"{mm}SFZDATA.csv").write_text("\n".join(fee_lines) + "\n")

        # --- camera observations
        speed_lines = []
        for _ in range(800 * scale):
            plate, en, ex, _, _ = trips[rng.randrange(len(trips))]
            span = int((ex - en).total_seconds())
            ts = en + dt.timedelta(seconds=rng.randrange(max(span, 1)))
            if ts >= m_next or ts < m_start:
                ts = en  # keep within the file's month
            guid = f"S{rng.randrange(70):03d}"  # some orphans (S060+)
            clsd = rng.choice([40, 60, 80, 99, 100, 101, 119, 120, 121, 140, 160])
            speed_lines.append(
                f"{guid},{plate},{ts.strftime(TS_FMT)},{clsd},{int(clsd > 120)}"
            )
        # hot-plate observations: concentrated on the hot trips, so the
        # obs ⋈ toll interval join sees both sides hot on one key
        if hot_plate:
            hot_trips = [t for t in trips if t[0] == "PHOT0"]
            for _ in range(400 * hot_plate):
                plate, en, ex, _, _ = hot_trips[rng.randrange(len(hot_trips))]
                span = int((ex - en).total_seconds())
                ts = en + dt.timedelta(seconds=rng.randrange(max(span, 1)))
                if ts >= m_next or ts < m_start:
                    ts = en
                guid = f"S{rng.randrange(70):03d}"
                clsd = rng.choice([40, 60, 80, 99, 100, 101, 119, 120, 121, 140, 160])
                speed_lines.append(
                    f"{guid},{plate},{ts.strftime(TS_FMT)},{clsd},{int(clsd > 120)}"
                )
        # exact containment boundaries: observations at ENTIME and EXTIME
        for t in (0, 1, 2):
            plate, en, ex, _, _ = trips[t]
            if en >= m_start and en < m_next:
                speed_lines.append(f"S001,{plate},{en.strftime(TS_FMT)},121,1")
            if ex >= m_start and ex < m_next:
                speed_lines.append(f"S001,{plate},{ex.strftime(TS_FMT)},121,1")
        # month-start boundary instant (1st 00:00:00) inside some trip
        plate_b = "PB" + (MONTHS[MONTHS.index(mm) - 1] if mm != MONTHS[0] else mm)
        speed_lines.append(f"S002,{plate_b},{m_start.strftime(TS_FMT)},130,1")
        # duplicate identical rows (UNION DISTINCT exercise)
        dup = f"S003,{trips[5][0]},{(trips[5][1] + dt.timedelta(minutes=5)).strftime(TS_FMT)},125,1"
        speed_lines += [dup, dup, dup]
        # malformed rows
        speed_lines.append(f"S004,P0004,not-a-date,90,0")
        speed_lines.append(f"S005,,{m_start.strftime(TS_FMT)},90,0")
        speed_lines.append(f"S006,P0006,{m_start.strftime(TS_FMT)},90,")  # trailing empty
        speed_lines.append("short")
        (mdir / f"{mm}CSYDATA.csv").write_text("\n".join(speed_lines) + "\n")

    # --- accidents (all fields quoted; 20 fields)
    acc_lines = []
    for i in range(600 * scale):
        d = dt.datetime(2016, rng.randint(6, 12), rng.randint(1, 28), rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59))
        lon = round(rng.uniform(115.0, 120.0), 6)
        lat = round(rng.uniform(35.0, 41.0), 6)
        date_s = d.strftime(TS_FMT) if i % 37 else "not a date"
        acls = str(rng.randint(1, 4)) if i % 23 else "NaN"
        fields = [
            acls, str(rng.randint(0, 50000)), f"C{i:05d}", date_s,
            str(rng.randint(1, 4)), str(rng.randint(100, 999)), f"Road{i % 9}",
            f"Part{i % 4}", f"Dir{i % 2}", f"K{i % 300}", str(rng.randint(0, 999)),
            str(lon), str(lat), f"T{i % 6}", str(rng.randint(0, 3)),
            str(rng.randint(0, 5)), str(rng.randint(0, 9)), str(rng.randint(1, 4)),
            f"L{i % 5}", f"W{i % 7}",
        ]
        acc_lines.append(",".join(f'"{f}"' for f in fields))
    acc_lines.append('"1","2","bad row"')  # arity drop
    (base / "TF_ZFZD_CASESPECIFICATION.csv").write_text("\n".join(acc_lines) + "\n")


# --- oracle: reference semantics in pure Python -------------------------------


def _jsplit(line: str) -> list[str]:
    """Java ``String.split(",")``: trailing empty strings removed."""
    fields = line.split(",")
    while fields and fields[-1] == "":
        fields.pop()
    return fields


def _parse_ts_millis(s: str) -> tuple[int, dt.datetime]:
    try:
        d = dt.datetime.strptime(s, TS_FMT)
    except ValueError:
        d = dt.datetime(1970, 1, 1)
    return _millis(d), d


def _read_lines(path: Path) -> list[list[str]]:
    if not path.exists():
        return []
    return [_jsplit(l) for l in path.read_text().splitlines() if l]


def _bbox_guids(base: Path, bbox) -> set[str]:
    lon_lo, lon_hi, lat_lo, lat_hi = bbox
    out = set()
    for f in _read_lines(base / "speed_base.csv"):
        if len(f) != 8 or not f[6] or not f[7]:
            continue
        lon, lat = float(f[6]), float(f[7])
        if lon_lo <= lon <= lon_hi and lat_lo <= lat <= lat_hi:
            out.add(f[2])
    return out


def _speed_rows(base: Path, mm: str):
    """(guid, plate, millis, hour, clsd) per src/OverSpeedCount.scala:66-81."""
    rows = []
    for f in _read_lines(base / mm / f"{mm}CSYDATA.csv"):
        if len(f) != 5 or not all(len(x) > 0 for x in f):
            continue
        ms, d = _parse_ts_millis(f[2])
        if ms <= 0:
            continue
        try:
            clsd = int(f[3])
        except ValueError:
            clsd = 0  # engine's lenient cast; reference would crash (documented)
        rows.append((f[0], f[1], ms, d.hour, clsd))
    return rows


def _fee_rows(base: Path, mm: str):
    """plate-indexed trips per src/OverSpeedCount.scala:83-105."""
    by_plate = defaultdict(list)
    for f in _read_lines(base / mm / f"{mm}SFZDATA.csv"):
        if len(f) != 8 or not f[1] or not f[3]:
            continue
        ex_ms, _ = _parse_ts_millis(f[1])
        en_ms, _ = _parse_ts_millis(f[3])
        if ex_ms <= 0 or en_ms <= 0:
            continue
        by_plate[f[5]].append((en_ms, ex_ms, f[4], f[7]))
    return by_plate


def _months_between(start: dt.date, end: dt.date) -> list[str]:
    out, (y, m) = [], (start.year, start.month)
    while (y, m) <= (end.year, end.month):
        out.append(f"{y:04d}{m:02d}")
        m += 1
        if m == 13:
            y, m = y + 1, 1
    return out


def _classed_tuples(base, mm, guids, t_lo, t_hi, closed_hi):
    """One month's (speed, hour, class, type) join output."""
    fee = _fee_rows(base, mm)
    out = []
    for guid, plate, ms, hour, clsd in _speed_rows(base, mm):
        if guid not in guids:
            continue
        in_range = (ms >= t_lo) and (ms <= t_hi if closed_hi else ms < t_hi)
        if not in_range:
            continue
        for en, ex, cls, flag in fee.get(plate, ()):
            if en <= ms <= ex:
                out.append((clsd, hour, cls, flag))
    return out


def _segment(cls: str, typ: str) -> str | None:
    try:
        c, t = int(cls), int(typ)
    except ValueError:
        return None
    if t == 0:
        return "01" if c == 1 else ("02" if c > 1 else None)
    if t == 1:
        return "03" if c == 1 else ("04" if c > 1 else None)
    return None


def oracle_accident_count(base: Path, bbox, start_date: str, end_date: str):
    lon_lo, lon_hi, lat_lo, lat_hi = bbox
    start = dt.datetime.strptime(start_date, "%Y-%m-%d")
    end = dt.datetime.strptime(end_date, "%Y-%m-%d") + dt.timedelta(days=1)
    lo, hi = _millis(start), _millis(end)
    counts = Counter()
    for f in _read_lines(base / "TF_ZFZD_CASESPECIFICATION.csv"):
        if len(f) != 20:
            continue
        g = [x[1:-1] for x in f]  # slice(1, len-1) unquote
        ms, d = _parse_ts_millis(g[3])
        try:
            lon = float(g[11])
        except ValueError:
            lon = 0.0
        try:
            lat = float(g[12])
        except ValueError:
            lat = 0.0
        if lo <= ms <= hi and lon_lo <= lon <= lon_hi and lat_lo <= lat <= lat_hi:
            counts[d.hour] += 1
    return {(h, c) for h, c in counts.items()}


def oracle_overspeed(base: Path, bbox, start_date: str, end_date: str):
    start = dt.datetime.strptime(start_date, "%Y-%m-%d")
    end = dt.datetime.strptime(end_date, "%Y-%m-%d")
    months = _months_between(start.date(), end.date())
    guids = _bbox_guids(base, bbox)
    tuples = []
    for mm in months:
        t_lo = _millis(start) if mm == months[0] else _millis(_month_start(mm))
        t_hi = (
            _millis(end + dt.timedelta(days=1))
            if mm == months[-1]
            else _millis(_month_start(_next_month(mm)))
        )
        tuples += _classed_tuples(base, mm, guids, t_lo, t_hi, closed_hi=True)
    if len(months) > 1:
        tuples = set(tuples)
    counts = Counter()
    for speed, hour, cls, flag in tuples:
        seg = _segment(cls, flag)
        if seg and speed > (100 if seg == "04" else 120):
            counts[(seg, hour)] += 1
    return {(seg, h, c) for (seg, h), c in counts.items()}


def oracle_avgspeed(base: Path, bbox, date: str):
    end = dt.datetime.strptime(date, "%Y-%m-%d")
    start = end - dt.timedelta(days=30)
    guids = _bbox_guids(base, bbox)

    # today branch: query month's files, calendar filter from START (the bug)
    mm_today = f"{end.year:04d}{end.month:02d}"
    fee_today = _fee_rows(base, mm_today)
    today_tuples = []
    for guid, plate, ms, hour, clsd in _speed_rows(base, mm_today):
        d = dt.datetime.fromtimestamp(ms / 1000, UTC)
        if (d.day, d.month, d.year) != (start.day, start.month, start.year):
            continue
        if guid not in guids:
            continue
        for en, ex, cls, flag in fee_today.get(plate, ()):
            if en <= ms <= ex:
                today_tuples.append((clsd, hour, cls, flag))

    # history branch: clamped trailing-30d, half-open ranges
    hist_start = max(start, dt.datetime(2016, 6, 1))
    months = _months_between(hist_start.date(), end.date())
    hist_tuples = []
    for mm in months:
        t_lo = _millis(hist_start) if mm == months[0] else _millis(_month_start(mm))
        t_hi = (
            _millis(end + dt.timedelta(days=1))
            if mm == months[-1]
            else _millis(_month_start(_next_month(mm)))
        )
        hist_tuples += _classed_tuples(base, mm, guids, t_lo, t_hi, closed_hi=False)
    if len(months) > 1:
        hist_tuples = set(hist_tuples)

    out = set()
    for time_point, tuples in ((0, hist_tuples), (1, today_tuples)):
        sums = defaultdict(lambda: [0, 0])
        for speed, hour, cls, flag in tuples:
            seg = _segment(cls, flag)
            if seg:
                acc = sums[(seg, hour)]
                acc[0] += speed
                acc[1] += 1
        for (seg, hour), (s, n) in sums.items():
            out.add((time_point, seg, hour, s / n))
    return out
