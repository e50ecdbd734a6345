"""Data-standardization function library (SURVEY §2.8, F1-F17).

Every function here is a pure ``Column -> Column`` expression builder —
no Python UDFs — so the whole cleaning pipeline stays inside Catalyst /
whole-stage codegen and runs vectorized on the JVM. At 100 TB this is
the difference between a scan-speed ETL and a Python-bottlenecked one.

Semantics follow the reference's JS implementations (they are what
actually processed the shipped data):

* standardizePassengerKey   — smartFileProcessor.js:294-300,
                              scripts/uploadPassengers.js:13-37 (numeric variant)
* standardizeEmail          — smartFileProcessor.js:303-316
* standardizeCountry        — smartFileProcessor.js:318-348 (full-name map)
* amount standardizer       — smartFileProcessor.js:391-394 (parseFloat + toFixed(2))
* standardizeDate           — smartFileProcessor.js:416-424 (JS Date leniency →
                              explicit format list; formats present in data:
                              ISO, MM/dd/yyyy, dd-MMM-yy, yyyyMMdd)
* transaction id synth      — smartFileProcessor.js:385-389
* standardizeLoyaltyStatus  — scripts/uploadPassengers.js:39-51
* alliance N/A → NULL       — smartFileProcessor.js:446-448

Known divergences from the PL/pgSQL twins (for supabase/database
functions) are resolved in favor of the JS versions; see SURVEY §2.8.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, IntegerType

EMAIL_RE = r"^[^\s@]+@[^\s@]+\.[^\s@]+$"

# Full-name convention from smartFileProcessor.js:320-331 (the PL/pgSQL twin
# maps to short codes USA/UK/UAE — JS wins; divergence recorded in SURVEY).
COUNTRY_ALIASES: dict[str, str] = {
    "us": "United States",
    "usa": "United States",
    "united states": "United States",
    "u.s.a.": "United States",
    "u.s.": "United States",
    "uk": "United Kingdom",
    "united kingdom": "United Kingdom",
    "great britain": "United Kingdom",
    "england": "United Kingdom",
    "uae": "United Arab Emirates",
    "united arab emirates": "United Arab Emirates",
    "u.a.e.": "United Arab Emirates",
}

INSURANCE_DELAY_MINUTES = 240  # server.js:163 / denorm view CASE


def non_digits_stripped(c: Column) -> Column:
    return F.regexp_replace(c, "[^0-9]", "")


def standardize_passenger_key(c: Column, accept_numeric: bool = False) -> Column:
    """F1 — 'P' + last-3-digits, zero-padded; NULL when unstandardizable.

    ``accept_numeric=True`` adds the script variant's rule (uploadPassengers.js
    :28-34): keys with digits but no 'P' are also accepted. Note the last-3
    truncation is lossy by design (P1001 and P2001 both → P001); dedup-after-
    standardization semantics are the caller's concern (keep-first, W2).
    """
    digits = non_digits_stripped(c)
    ok_digits = F.length(digits) >= 3
    std = F.concat(F.lit("P"), F.lpad(digits.substr(F.length(digits) - 2, F.lit(3)), 3, "0"))
    has_p = c.contains("P")
    accepted = (has_p | F.lit(bool(accept_numeric))) & ok_digits
    return F.when(c.isNotNull() & accepted, std).otherwise(F.lit(None))


def standardize_email(full_name: Column, existing_email: Column) -> Column:
    """F2 — keep a valid existing email (lowercased), else synthesize
    ``first.last@example.com`` from the first and LAST name tokens."""
    valid = existing_email.isNotNull() & existing_email.rlike(EMAIL_RE)
    no_name = full_name.isNull() | (F.trim(full_name) == "")
    tokens = F.split(F.trim(full_name), " ")
    first = F.lower(F.element_at(tokens, 1))
    last = F.lower(F.element_at(tokens, -1))
    synthesized = F.when(no_name, F.lit("user@example.com")).when(
        F.size(tokens) > 1,
        F.concat(first, F.lit("."), last, F.lit("@example.com")),
    ).otherwise(F.concat(first, F.lit("@example.com")))
    return F.when(valid, F.lower(existing_email)).otherwise(synthesized)


def standardize_country(c: Column) -> Column:
    """F3 — alias-map to canonical full names; fallback: first-char-upper +
    rest-lower of the raw value; NULL/empty → 'Unknown'.

    The reference also consults the (phantom) country hierarchy with an
    ilike lookup between map and fallback; that per-row network call becomes
    a broadcast left join at the ETL layer (etl.py), not a scalar function.
    """
    mapping = F.create_map(*[F.lit(x) for kv in COUNTRY_ALIASES.items() for x in kv])
    normalized = F.lower(F.trim(c))
    title = F.concat(F.upper(F.substring(c, 1, 1)), F.lower(F.substring(c, 2, 2_000_000)))
    return F.when(c.isNull() | (F.trim(c) == ""), F.lit("Unknown")) \
        .when(mapping[normalized].isNotNull(), mapping[normalized]) \
        .otherwise(title)


def standardize_amount(c: Column, scale: int = 2) -> Column:
    """F4 — strip currency junk, parseFloat semantics, NaN→0.00, 2-dp.

    JS: ``parseFloat(String(x).replace(/[^\\d.-]/g, '')).toFixed(2)``.
    parseFloat reads the longest valid numeric prefix, so ``$1,540.00`` →
    ``1540.00`` and ``1.2.3`` → ``1.2``. Unparseable → 0.00.
    """
    cleaned = F.regexp_replace(c.cast("string"), r"[^0-9.\-]", "")
    prefix = F.regexp_extract(cleaned, r"^[+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)", 0)
    num = F.when(prefix == "", F.lit(None)).otherwise(prefix).cast(DecimalType(28, 10))
    return F.coalesce(F.round(num, scale), F.lit(0)).cast(DecimalType(10, scale))


def standardize_date(c: Column) -> Column:
    """F5 — multi-format date parse; unparseable → NULL (→ quarantine).

    The JS version leans on ``new Date(str)``; we enumerate the formats
    actually present in the data plus ISO timestamps.
    """
    s = F.trim(c.cast("string"))
    # Java's 'yy' is base-2000 (95 → 2095); JS Date follows the C pivot
    # (00-68 → 20xx, 69-99 → 19xx). Parse then shift the century back.
    yy = F.to_date(s, "dd-MMM-yy")
    yy_pivoted = F.when(F.year(yy) >= 2069, F.add_months(yy, -1200)).otherwise(yy)
    return F.coalesce(
        F.to_date(s, "yyyy-MM-dd"),
        F.to_date(s, "MM/dd/yyyy"),
        F.to_date(s, "dd-MMM-yyyy"),
        yy_pivoted,
        F.when(s.rlike(r"^[0-9]{8}$"), F.to_date(s, "yyyyMMdd")),
        F.to_date(s, "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]"),
    )


def date_key_of(d: Column) -> Column:
    """F6 — yyyyMMdd integer encoding of a date."""
    return F.date_format(d, "yyyyMMdd").cast(IntegerType())


def synth_transaction_id(c: Column, prefix: str) -> Column:
    """F7 — digits-only of the source id, zero-padded to ≥6, prefixed.

    JS ``padStart(6,'0')`` never truncates longer ids — guard lpad
    (which would) behind a length check.
    """
    digits = non_digits_stripped(c.cast("string"))
    padded = F.when(F.length(digits) >= 6, digits).otherwise(F.lpad(digits, 6, "0"))
    return F.concat(F.lit(prefix), padded)


def standardize_loyalty_status(c: Column) -> Column:
    """F8 — fuzzy loyalty mapping; default Bronze."""
    u = F.upper(F.trim(c))
    return (
        F.when(c.isNull(), "Bronze")
        .when(u.contains("PLATINUM") | (u == "PLAT"), "Platinum")
        .when(u.contains("GOLD"), "Gold")
        .when(u.contains("SILVER") | (u == "SILV"), "Silver")
        .when(u.contains("BRONZE") | (u == "BRNZ"), "Bronze")
        .otherwise("Bronze")
    )


def na_to_null(c: Column) -> Column:
    """F10 — trimmed 'N/A' → NULL; anything else (including '') stays as
    its trimmed value (smartFileProcessor.js:448 — the reference compares
    the trimmed alliance to 'N/A' only and keeps empty strings)."""
    t = F.trim(c)
    return F.when(t == "N/A", F.lit(None)).otherwise(t)


def strip_single_quotes(c: Column) -> Column:
    """Corporate positional CSV values arrive as ``'AA100'`` with leading
    spaces (datasets/corporate_sales.csv) — trim then strip quote chars."""
    return F.regexp_replace(F.trim(c), "^'|'$", "")


def carrier_of_flight(flight_key: Column) -> Column:
    """F11 — LEFT(flight_key, 2): carrier code derivation (join J6)."""
    return F.substring(flight_key, 1, 2)


def insurance_eligibility_status(delay_minutes: Column) -> Column:
    """P5/P7 — the denorm view's CASE over the 240-minute threshold."""
    return F.when(delay_minutes > INSURANCE_DELAY_MINUTES, "Eligible").otherwise("Not Eligible")
