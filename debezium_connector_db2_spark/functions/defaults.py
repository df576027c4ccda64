"""Column default-value parsing — C8 (SURVEY.md §2.8).

The reference parses textual column defaults from Db2 catalog metadata
before applying them to events (``Db2DefaultValueConverter.java:96-229``):

* single-quoted literals are unquoted (``:109-117``);
* ``CHAR(n)`` defaults are blank-padded to the declared length
  (``:131-136, 213-219``);
* booleans accept ``0``/``1`` (``:126-129``);
* the special registers ``CURRENT DATE`` / ``CURRENT TIME`` /
  ``CURRENT TIMESTAMP`` resolve to the clock at DDL-application time
  (``:96-107, 138-160``);
* decimals are rescaled to the column scale with HALF_EVEN rounding
  (``:186-199``).

``parse_default_value`` renders those rules for our lake's ADD COLUMN
backfill.  The return value is always JSON-serializable (the lake stores
it in the manifest) and castable by ``F.lit(v).cast(dtype)`` on read:
timestamps/dates come back as ISO strings, decimals as plain strings.
"""

from __future__ import annotations

import datetime
import decimal
import re

_REGISTERS = {"CURRENT DATE", "CURRENT_DATE", "CURRENT TIME", "CURRENT_TIME",
              "CURRENT TIMESTAMP", "CURRENT_TIMESTAMP"}

_CHAR_RE = re.compile(r"^char\((\d+)\)$", re.IGNORECASE)
_DECIMAL_RE = re.compile(r"^(?:decimal|numeric)\((\d+)\s*,\s*(\d+)\)$",
                         re.IGNORECASE)


def _unquote(raw: str) -> str:
    raw = raw.strip()
    if len(raw) >= 2 and raw[0] == "'" and raw[-1] == "'":
        return raw[1:-1].replace("''", "'")
    return raw


def parse_default_value(dtype: str, raw: str,
                        now: datetime.datetime | None = None):
    """Parse a textual Db2-style default into a literal for ``dtype``.

    ``now`` pins the clock for the CURRENT * registers (tests pass a fixed
    instant; production uses UTC now — the reference likewise evaluates
    registers when the default is materialized, not per row).
    """
    if raw is None:
        return None
    now = now or datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    stripped = raw.strip()
    upper = stripped.upper().replace("  ", " ")

    if upper in _REGISTERS:
        reg = upper.replace("_", " ")
        if reg == "CURRENT DATE":
            return now.date().isoformat()
        if reg == "CURRENT TIMESTAMP":
            return now.isoformat(sep=" ", timespec="microseconds")
        # CURRENT TIME -> Db2 streams TIME as millis-of-day int32
        # (AbstractDb2DefaultValueIT.java:184-187); as a string type it is
        # the ISO clock time.
        if dtype.lower() in ("int", "integer", "bigint", "long"):
            midnight = now.replace(hour=0, minute=0, second=0, microsecond=0)
            # TIME is second-precision in Db2; millis-of-day representation
            return int((now.replace(microsecond=0) - midnight)
                       .total_seconds()) * 1000
        return now.time().replace(microsecond=0).isoformat()

    mchar = _CHAR_RE.match(dtype.strip())
    if mchar:
        return _unquote(stripped).ljust(int(mchar.group(1)))

    dt = dtype.strip().lower()
    if dt in ("string", "varchar", "text") or dt.startswith("varchar"):
        return _unquote(stripped)
    if dt == "boolean":
        v = _unquote(stripped).lower()
        return v in ("1", "true", "t", "yes")
    if dt in ("int", "integer", "bigint", "long", "short", "smallint",
              "tinyint"):
        return int(_unquote(stripped))
    if dt in ("double", "float", "real"):
        return float(_unquote(stripped))
    mdec = _DECIMAL_RE.match(dt)
    if mdec:
        scale = int(mdec.group(2))
        q = decimal.Decimal(1).scaleb(-scale)
        return str(decimal.Decimal(_unquote(stripped))
                   .quantize(q, rounding=decimal.ROUND_HALF_EVEN))
    if dt == "date":
        return datetime.date.fromisoformat(_unquote(stripped)).isoformat()
    if dt == "timestamp":
        s = _unquote(stripped).replace("T", " ")
        # Db2 catalog format uses '-' time separators (2022-01-01-00.00.00)
        if s.count("-") > 2:
            d, t = s[:10], s[11:].replace(".", ":", 2)
            s = f"{d} {t}"
        return datetime.datetime.fromisoformat(s).isoformat(sep=" ")
    return _unquote(stripped)
