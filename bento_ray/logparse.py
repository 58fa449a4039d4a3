"""Syslog parsers — the ``parse_log`` processor's formats.

Reference: internal/impl/pure/processor_parse_log.go:141-260 (delegates
to influxdata/go-syslog). Output field names and shapes replicate the
reference exactly (facility = priority>>3, severity = priority&7,
timestamps in RFC3339Nano; absent fields omitted):

  rfc5424: <PRI>VERSION TIMESTAMP HOSTNAME APP-NAME PROCID MSGID
           [SD-ID k="v" ...]... MSG
  rfc3164: <PRI>Mmm dd hh:mm:ss HOSTNAME TAG[PID]: MSG
"""

from __future__ import annotations

import datetime
import re


class LogParseError(ValueError):
    pass


_NIL = "-"

_RFC5424_RE = re.compile(
    r"^<(?P<pri>\d{1,3})>(?P<ver>\d{1,2}) "
    r"(?P<ts>\S+) (?P<host>\S+) (?P<app>\S+) (?P<procid>\S+) "
    r"(?P<msgid>\S+)(?: (?P<rest>.*))?$", re.S)

_SD_RE = re.compile(r'\[([^\s\]=]+)((?:\s+[^\s=\]]+="(?:[^"\\]|\\.)*")*)\]')
_SD_PARAM_RE = re.compile(r'([^\s=\]]+)="((?:[^"\\]|\\.)*)"')

_RFC3164_RE = re.compile(
    r"^<(?P<pri>\d{1,3})>"
    r"(?P<ts>[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}|"
    r"\d{4}-\d{2}-\d{2}T[0-9:.+\-Z]+) "
    r"(?P<host>\S+) "
    r"(?P<tag>[^\[:\s]+)(?:\[(?P<procid>\w+)\])?:?\s?"
    r"(?P<msg>.*)$", re.S)

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])}


def _rfc3339nano(dt: datetime.datetime) -> str:
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if dt.microsecond:
        base += ("%.9f" % (dt.microsecond / 1e6))[1:].rstrip("0")
    off = dt.utcoffset()
    if off is None or off == datetime.timedelta(0):
        return base + "Z"
    return base + dt.strftime("%z")[:3] + ":" + dt.strftime("%z")[3:]


def parse_rfc5424(line: str) -> dict:
    m = _RFC5424_RE.match(line)
    if not m:
        raise LogParseError("invalid rfc5424 message")
    pri = int(m.group("pri"))
    out: dict = {
        "priority": pri,
        "facility": pri >> 3,
        "severity": pri & 7,
        "version": int(m.group("ver")),
    }
    ts = m.group("ts")
    if ts != _NIL:
        dt = datetime.datetime.fromisoformat(ts.replace("Z", "+00:00"))
        out["timestamp"] = _rfc3339nano(
            dt.astimezone(datetime.timezone.utc) if dt.tzinfo else
            dt.replace(tzinfo=datetime.timezone.utc))
    for key, grp in (("hostname", "host"), ("appname", "app"),
                     ("procid", "procid"), ("msgid", "msgid")):
        v = m.group(grp)
        if v != _NIL:
            out[key] = v
    rest = m.group("rest") or ""
    sd: dict = {}
    pos = 0
    if rest.startswith("["):
        while pos < len(rest) and rest[pos] == "[":
            sm = _SD_RE.match(rest, pos)
            if not sm:
                break
            params = {k: v.replace('\\"', '"')
                      for k, v in _SD_PARAM_RE.findall(sm.group(2))}
            sd[sm.group(1)] = params
            pos = sm.end()
        if pos < len(rest) and rest[pos] == " ":
            pos += 1
    elif rest.startswith(_NIL):
        pos = 1
        if pos < len(rest) and rest[pos] == " ":
            pos += 1
    if sd:
        out["structureddata"] = sd
    msg = rest[pos:]
    if msg:
        out["message"] = msg
    return out


def parse_rfc3164(line: str, with_year: str | int | None = "current",
                  tz: datetime.tzinfo = datetime.timezone.utc) -> dict:
    m = _RFC3164_RE.match(line)
    if not m:
        raise LogParseError("invalid rfc3164 message")
    pri = int(m.group("pri"))
    out: dict = {
        "priority": pri,
        "facility": pri >> 3,
        "severity": pri & 7,
    }
    ts = m.group("ts")
    if ts[0].isdigit():  # rfc3339 extension
        dt = datetime.datetime.fromisoformat(ts.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=tz)
    else:
        # parse by fields, not fixed offsets — "Oct  5" and "Oct 5"
        # both occur in the wild (single-digit days may or may not be
        # zero-padded / double-spaced)
        tm = re.match(r"([A-Z][a-z]{2})\s+(\d{1,2}) "
                      r"(\d{2}):(\d{2}):(\d{2})", ts)
        if not tm:
            raise LogParseError("invalid rfc3164 timestamp")
        mon = _MONTHS[tm.group(1)]
        day = int(tm.group(2))
        hh, mm, ss = (int(tm.group(i)) for i in (3, 4, 5))
        if with_year == "current":
            year = datetime.datetime.now(tz).year
        elif with_year:
            year = int(with_year)
        else:
            year = 0
        dt = datetime.datetime(year or 1, mon, day, hh, mm, ss, tzinfo=tz)
    out["timestamp"] = _rfc3339nano(dt.astimezone(datetime.timezone.utc))
    out["hostname"] = m.group("host")
    out["appname"] = m.group("tag")
    if m.group("procid"):
        out["procid"] = m.group("procid")
    out["message"] = m.group("msg")
    return out


def parse_log(line: str, fmt: str = "syslog_rfc3164",
              best_effort: bool = True, **kw) -> dict:
    if fmt == "syslog_rfc5424":
        return parse_rfc5424(line)
    if fmt == "syslog_rfc3164":
        return parse_rfc3164(line, **kw)
    raise LogParseError(f"unsupported log format {fmt}")
