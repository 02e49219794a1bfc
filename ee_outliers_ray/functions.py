"""Scalar functions / per-record extractors (SURVEY §2.3 M1-M15).

Value-exact reimplementations of the reference helpers
(/root/reference/app/helpers/utils.py, /root/reference/app/analyzers/
metrics.py:363-489), vectorized where the reference loops per char:

- shannon_entropy   (utils.py:113-127)  — byte-frequency entropy; chars
  with codepoint > 255 count toward length but never toward frequency,
  exactly like the reference's ``data.count(chr(x)) for x in range(256)``.
- kl_divergence     (utils.py:90-110)   — char distribution vs the fixed
  English table (metrics.py:394-406); chars absent from the table skipped.
- is_base64_encoded (utils.py:265-277), is_hex_encoded (utils.py:280-291),
  is_url (utils.py:294-305; regex stand-in for ``validators.url``),
  match_ip_ranges (utils.py:79-87; ipaddress stand-in for netaddr).
- flatten_sentence  (utils.py:160-184), flatten_fields_into_sentences
  (utils.py:192-230) — the " - " sentence semantics.
- replace_placeholder_fields_with_values (utils.py:233-262).
- calculate_metric  (metrics.py:363-489) — the 7 metric kernels.
"""

from __future__ import annotations

import base64
import math
import re
from ipaddress import ip_address, ip_network
from itertools import product

import numpy as np

ENGLISH_CHARACTER_FREQUENCIES = {
    'g': 0.02706810814315049, 'o': 0.07421531631063037, 'l': 0.04660619075683699,
    'e': 0.0938650686651803, 'f': 0.016087468884472687, 'a': 0.08965206537963542,
    'c': 0.046178435692422186, 'b': 0.021492396761465096, 'k': 0.017011742091988323,
    'y': 0.017683540507870608, 'u': 0.03113815167654972, 't': 0.05877603780957555,
    'w': 0.012812697524051385, 'i': 0.07074249978897978, 'r': 0.06343497059722608,
    'm': 0.033597415407595026, 's': 0.06260194430883878, 'n': 0.06262892491736954,
    'd': 0.031030885021106236, 'p': 0.026214752715696614, 'v': 0.013545577039801925,
    'h': 0.027979827873085842, 'z': 0.007096836870275642, '-': 0.010803953745868712,
    '3': 0.0020435937308682425, 'q': 0.002948193577996864, 'x': 0.006551510056881306,
    'j': 0.006711051641353142, '0': 0.0027525841661488358, '1': 0.0029865097894172872,
    '2': 0.0027598914142925837, '6': 0.0017662930320798498, '4': 0.001964712923983166,
    '5': 0.0017608594373062934, '8': 0.0021597602398201366, '9': 0.0017470880850353834,
    '7': 0.0015831434151435972,
}

_URL_RE = re.compile(
    r"^(?:[a-z][a-z0-9+.-]*)://"              # scheme
    r"(?:\S+(?::\S*)?@)?"                      # user:pass@
    r"(?:[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
    r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+"  # dotted host
    r"|\d{1,3}(?:\.\d{1,3}){3}|\[[0-9A-Fa-f:]+\])"            # ipv4 / ipv6
    r"(?::\d{2,5})?"
    r"(?:[/?#]\S*)?$",
    re.IGNORECASE,
)


def duck_round(x, digits: int):
    """Round-half-away-from-zero for non-negative doubles — bit-identical
    to DuckDB's ``round(x, d)``, unlike numpy's half-to-even.  Used on
    every float column that crosses the DuckDB hash-compare (empirically
    validated against duckdb over 25k values incl. exact halves)."""
    p = 10.0 ** digits
    y = np.asarray(x, dtype=np.float64) * p
    f = np.floor(y)
    return np.where(y - f >= 0.5, f + 1, f) / p


def shannon_entropy(data: str) -> float:
    if not data:
        return 0
    codes = np.fromiter(map(ord, data), dtype=np.int64, count=len(data))
    counts = np.bincount(codes[codes < 256], minlength=1)
    p = counts[counts > 0] / len(data)
    return float(-(p * np.log2(p)).sum())


def kl_divergence(data: str, baseline: dict[str, float] | None = None) -> float:
    if not data:
        return 0
    baseline = baseline or ENGLISH_CHARACTER_FREQUENCIES
    n = len(data)
    entropy = 0.0
    seen: dict[str, int] = {}
    for ch in data:
        seen[ch] = seen.get(ch, 0) + 1
    for ch, cnt in seen.items():
        if ch in baseline:
            freq = cnt / n
            entropy += freq * math.log(freq / baseline[ch], 2)
    return entropy


def is_base64_encoded(s: str):
    """Decoded ascii string on strict round-trip, else falsy."""
    try:
        decoded_bytes = base64.b64decode(s)
        if base64.b64encode(decoded_bytes) == s.encode("ascii"):
            return decoded_bytes.decode("ascii")
    except Exception:
        return False


def is_hex_encoded(s: str):
    try:
        decoded = int(s, 16)
        return str(decoded)
    except Exception:
        return False


def is_url(s: str) -> bool:
    try:
        return bool(_URL_RE.match(s))
    except Exception:
        return False


def match_ip_ranges(source_ip: str, cidrs: list[str]) -> bool:
    try:
        ip = ip_address(source_ip)
    except ValueError:
        return False
    return any(ip in ip_network(c, strict=False) for c in cidrs)


def flatten_dict(d: dict, parent_key: str = "", sep: str = ".") -> dict:
    """Flatten nested dict to dotted keys (utils.py:28-44)."""
    items = []
    for k, v in d.items():
        new_key = parent_key + sep + k if parent_key else k
        if isinstance(v, dict):
            items.extend(flatten_dict(v, new_key, sep=sep).items())
        else:
            items.append((new_key, v))
    return dict(items)


def get_dotkey_value(dict_value, key_name: str, case_sensitive: bool = True):
    """Dotted-path nested get, optional case-insensitive match per level;
    missing key raises KeyError (utils.py:47-76)."""
    for k in key_name.split("."):
        if not case_sensitive:
            lowered = {str(dk).lower(): dk for dk in dict_value.keys()}
            if k.lower() not in lowered:
                raise KeyError(k)
            dict_value = dict_value[lowered[k.lower()]]
        else:
            dict_value = dict_value[k]
    return dict_value


def struct_field_column(batch, dotted: str, case_sensitive: bool = True):
    """Arrow-side dotted-path access: resolve each path element against
    the schema (case-insensitivity resolved ONCE at plan/schema level,
    not per row — SURVEY M1 mapping) and return the child array."""
    import pyarrow as pa
    import pyarrow.compute as pc

    parts = dotted.split(".")
    top = parts[0]
    names = batch.column_names if hasattr(batch, "column_names") else []
    if not case_sensitive:
        match = [n for n in names if n.lower() == top.lower()]
        if not match:
            raise KeyError(top)
        top = match[0]
    col = batch[top]
    for p in parts[1:]:
        typ = col.type
        if not pa.types.is_struct(typ):
            raise KeyError(p)
        field_names = [typ.field(i).name for i in range(typ.num_fields)]
        if not case_sensitive:
            cand = [n for n in field_names if n.lower() == p.lower()]
            if not cand:
                raise KeyError(p)
            p = cand[0]
        elif p not in field_names:
            raise KeyError(p)
        col = pc.struct_field(col, p)
    return col


def flatten_struct_columns(ds):
    """M2 at Dataset level: explode every struct column into dotted-name
    scalar columns (schema flattening at ingest)."""
    import pyarrow as pa

    def f(batch: pa.Table) -> pa.Table:
        cols = {}

        def add(name, col):
            if pa.types.is_struct(col.type):
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                for i in range(arr.type.num_fields):
                    child = arr.field(i)
                    add(f"{name}.{arr.type.field(i).name}", child)
            else:
                cols[name] = col

        for name in batch.column_names:
            add(name, batch[name])
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def flatten_sentence(sentence) -> str | None:
    """list -> ' - '-joined string; nested list/dict -> None (utils.py:160-184)."""
    if sentence is None:
        return None
    if isinstance(sentence, (list, tuple)):
        parts = []
        for v in sentence:
            if isinstance(v, (list, tuple, dict)):
                return None
            parts.append(str(v))
        return " - ".join(parts)
    if isinstance(sentence, dict):
        return None
    return str(sentence)


def flatten_fields_into_sentences(fields: dict, sentence_format: list[str]) -> list[list]:
    """Cartesian fan-out of multi-valued fields (utils.py:192-230)."""
    per_field = []
    for name in sentence_format:
        v = fields[name]
        per_field.append(v if isinstance(v, list) else [v])
    return [list(p) for p in product(*per_field)]


def replace_placeholder_fields_with_values(placeholder: str, fields: dict) -> str:
    """``{field}`` template substitution (utils.py:233-262)."""
    for m in re.findall(r"\{([^}]+)\}", placeholder):
        try:
            v = fields[m]
            if isinstance(v, list):
                v = ", ".join(str(x) for x in v)
            placeholder = placeholder.replace("{" + m + "}", str(v))
        except KeyError:
            placeholder = placeholder.replace(
                "{" + m + "}", "{field " + m + " not found in event}")
    return placeholder


# --- the 7 metric kernels (metrics.py:363-489) -------------------------------

METRICS = ("numerical_value", "length", "entropy", "relative_english_entropy",
           "hex_encoded_length", "base64_encoded_length", "url_length")

_HEX_SPLIT = re.compile(r"[^a-fA-F0-9+]")
_B64_SPLIT = re.compile(r"[^A-Za-z0-9+/=]")


def calculate_metric(metric: str, value) -> tuple[float | None, dict]:
    observations: dict = {}
    if metric == "numerical_value":
        try:
            return float(value), {}
        except ValueError:
            return None, {}
    if metric == "length":
        return len(value), {}
    if metric == "entropy":
        return shannon_entropy(value), {}
    if metric == "relative_english_entropy":
        return kl_divergence(value, ENGLISH_CHARACTER_FREQUENCIES), observations
    if metric == "hex_encoded_length":
        words = [w for w in _HEX_SPLIT.split(str(value))
                 if len(w) > 10 and is_hex_encoded(w)]
        if words:
            longest = sorted(words, key=len)[-1]
            observations["max_hex_encoded_length"] = len(longest)
            observations["max_hex_encoded_word"] = longest
            return len(longest), observations
        return 0, {}
    if metric == "base64_encoded_length":
        decoded_words = []
        for w in _B64_SPLIT.split(str(value)):
            d = is_base64_encoded(w)
            if d and len(d) >= 5:
                decoded_words.append(d)
        if decoded_words:
            longest = sorted(decoded_words, key=len)[-1]
            observations["max_base64_decoded_length"] = len(longest)
            observations["max_base64_decoded_word"] = longest
            return len(longest), observations
        return 0, {}
    if metric == "url_length":
        total = 0
        urls = []
        for w in str(value).replace('"', " ").split():
            if is_url(w):
                total += len(w)
                urls.append(w)
        if total > 0:
            observations["extracted_urls_length"] = total
            observations["extracted_urls"] = ",".join(urls)
        return total, observations
    return None, {}


def metric_column(metric: str, values: np.ndarray) -> np.ndarray:
    """Vectorized-where-possible metric over a string column; None -> nan."""
    if metric == "length":
        return np.array([len(v) for v in values], dtype=np.float64)
    if metric == "numerical_value":
        out = np.empty(len(values), dtype=np.float64)
        for i, v in enumerate(values):
            try:
                out[i] = float(v)
            except (ValueError, TypeError):
                out[i] = np.nan
        return out
    out = np.empty(len(values), dtype=np.float64)
    for i, v in enumerate(values):
        m, _ = calculate_metric(metric, v)
        out[i] = np.nan if m is None else m
    return out


# observation columns produced per metric kernel (metrics.py:276-311: the
# reference attaches these to every outlier document)
METRIC_OBSERVATION_FIELDS = {
    "hex_encoded_length": ("max_hex_encoded_length", "max_hex_encoded_word"),
    "base64_encoded_length": ("max_base64_decoded_length",
                              "max_base64_decoded_word"),
    "url_length": ("extracted_urls_length", "extracted_urls"),
}


def metric_column_with_observations(metric: str, values: np.ndarray
                                    ) -> tuple[np.ndarray, dict[str, list]]:
    """Metric values + per-row observation columns (empty dict for
    metrics without observations).  The numeric observation is -1 and the
    word observation "" when a row produced none."""
    fields = METRIC_OBSERVATION_FIELDS.get(metric)
    if fields is None:
        return metric_column(metric, values), {}
    num_name, word_name = fields
    out = np.empty(len(values), dtype=np.float64)
    nums: list[int] = []
    words: list[str] = []
    for i, v in enumerate(values):
        m, obs = calculate_metric(metric, v)
        out[i] = np.nan if m is None else m
        nums.append(int(obs.get(num_name, -1)))
        words.append(str(obs.get(word_name, "")))
    return out, {num_name: nums, word_name: words}
