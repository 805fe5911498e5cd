"""rosbag2 recording-directory front door (r12 — VERDICT r11 item 4).

Real rosbag2 recordings are a *directory*: ``metadata.yaml`` naming the
storage plugin (sqlite3 / mcap), the relative data files (splits), the
topics with types and serialization, and the compression layout, next
to the ``.db3`` / ``.mcap`` splits themselves. Until now the ``.db3``
path required the caller to hand-assemble that information
(``db3.py:22-25``'s loud-guard ``definitions`` mapping and a glob);
:func:`read_rosbag2` removes the manual step:

- parses + validates the sidecar (wrong/missing yaml errors loudly,
  naming the field);
- reads EXACTLY the listed splits (not a glob — a stray half-written
  ``.db3`` in the directory is not part of the recording);
- routes to the right extractor (``db3_messages_frame`` /
  ``mcap_messages_frame``) with the sidecar's compression layout
  (``file`` → whole-image zstd, already magic-sniffed by the db3
  parser; ``message`` → per-blob zstd, threaded through);
- feeds ``definitions`` from an optional ``.msg``-bundle directory
  (``<pkg>/msg/<Type>.msg`` files), overlaid by any explicit mapping —
  the one piece rosbag2 resolves from the installed interface packages
  at play time and therefore can never be in the files.

YAML parsing uses PyYAML when importable and otherwise falls back to a
builtin subset parser (block maps/lists/scalars — the machine-generated
shape rosbag2 writes; both paths are tested against the same golden
sidecar).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .db3 import db3_messages_frame
from .mcap import mcap_messages_frame

__all__ = ["read_rosbag2", "rosbag2_metadata", "load_definitions_dir"]

_ROOT_KEY = "rosbag2_bagfile_information"


# ------------------------------------------------------------- yaml
def _scalar(v: str):
    v = v.strip()
    if v in ("", "~", "null"):
        return None
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "\"'":
        return v[1:-1].replace("\\n", "\n").replace('\\"', '"')
    if v in ("true", "True"):
        return True
    if v in ("false", "False"):
        return False
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    return v


def _mini_yaml(text: str):
    """Builtin parser for the machine-generated YAML subset rosbag2
    writes: block maps, block lists (``- `` items, scalar or map),
    scalars (quoted strings keep escaped newlines — the
    offered_qos_profiles form), ``[]``/``{}`` empties. Anything
    outside the subset raises with the offending line."""
    lines = []
    for raw in text.splitlines():
        s = raw.strip()
        if not s or s.startswith("#"):
            continue
        lines.append([len(raw) - len(raw.lstrip(" ")), s])
    pos = [0]

    def block(indent):
        return (plist(indent) if lines[pos[0]][1].startswith("- ")
                else pmap(indent))

    def pmap(indent):
        out = {}
        while pos[0] < len(lines):
            ind, s = lines[pos[0]]
            if ind < indent or s.startswith("- "):
                break
            if ind > indent or ":" not in s:
                raise ValueError(f"metadata.yaml: unparseable line "
                                 f"{s!r} (builtin subset parser)")
            k, _, rest = s.partition(":")
            pos[0] += 1
            rest = rest.strip()
            if rest == "":
                if pos[0] < len(lines) and (
                        lines[pos[0]][0] > indent
                        or (lines[pos[0]][0] == indent
                            and lines[pos[0]][1].startswith("- "))):
                    out[k.strip()] = block(lines[pos[0]][0])
                else:
                    out[k.strip()] = None
            elif rest == "[]":
                out[k.strip()] = []
            elif rest == "{}":
                out[k.strip()] = {}
            else:
                out[k.strip()] = _scalar(rest)
        return out

    def plist(indent):
        out = []
        while pos[0] < len(lines):
            ind, s = lines[pos[0]]
            if ind != indent or not s.startswith("- "):
                break
            item = s[2:].strip()
            if ":" in item and item[0] not in "\"'":
                # map item: treat the rest of the line as the first
                # key of a map indented past the dash
                lines[pos[0]] = [ind + 2, item]
                out.append(pmap(ind + 2))
            else:
                pos[0] += 1
                out.append(_scalar(item))
        return out

    if not lines:
        return {}
    doc = block(lines[0][0])
    if pos[0] != len(lines):
        raise ValueError(f"metadata.yaml: unparseable line "
                         f"{lines[pos[0]][1]!r} (builtin subset parser)")
    return doc


def _parse_yaml(text: str):
    try:
        import yaml
    except ImportError:
        return _mini_yaml(text)
    return yaml.safe_load(text)


# -------------------------------------------------------- sidecar
def rosbag2_metadata(recording_dir: str) -> dict:
    """Parse + validate ``<recording_dir>/metadata.yaml``. Returns the
    ``rosbag2_bagfile_information`` mapping with the fields
    :func:`read_rosbag2` needs verified present and sane; every
    deviation errors loudly naming the field (a half-written or
    hand-edited sidecar must not silently read as an empty
    recording)."""
    if "://" in recording_dir:
        raise ValueError(
            "read_rosbag2 reads the sidecar driver-side and supports "
            "local recording directories (copy the recording down, or "
            "read splits directly via read_db3_messages/"
            "read_mcap_messages on any Hadoop-visible path)")
    p = os.path.join(recording_dir, "metadata.yaml")
    if not os.path.isfile(p):
        raise FileNotFoundError(
            f"{recording_dir} is not a rosbag2 recording directory: "
            f"no metadata.yaml")
    with open(p, encoding="utf-8") as f:
        doc = _parse_yaml(f.read())
    if not isinstance(doc, dict) or _ROOT_KEY not in doc:
        raise ValueError(
            f"{p}: missing top-level {_ROOT_KEY!r} mapping — not a "
            f"rosbag2 sidecar")
    info = doc[_ROOT_KEY]
    if not isinstance(info, dict):
        raise ValueError(f"{p}: {_ROOT_KEY} is not a mapping")
    storage = info.get("storage_identifier")
    if storage not in ("sqlite3", "mcap"):
        raise ValueError(
            f"{p}: storage_identifier must be 'sqlite3' or 'mcap', "
            f"got {storage!r}")
    rel = info.get("relative_file_paths")
    if not rel or not isinstance(rel, list) \
            or not all(isinstance(x, str) for x in rel):
        raise ValueError(
            f"{p}: relative_file_paths must be a non-empty list of "
            f"split file names")
    missing = [x for x in rel
               if not os.path.isfile(os.path.join(recording_dir, x))]
    if missing:
        raise FileNotFoundError(
            f"{p}: relative_file_paths name splits that do not exist "
            f"in the recording directory: {missing}")
    cfmt = info.get("compression_format") or ""
    cmode = info.get("compression_mode") or ""
    if cfmt not in ("", "zstd"):
        raise NotImplementedError(
            f"{p}: compression_format {cfmt!r} is not supported "
            f"(builtin: '' or 'zstd')")
    if cmode.lower() not in ("", "file", "message"):
        raise ValueError(
            f"{p}: compression_mode {cmode!r} is not a rosbag2 mode "
            f"('', 'file', 'message')")
    topics = []
    for t in info.get("topics_with_message_count") or []:
        tm = (t or {}).get("topic_metadata") or {}
        if not tm.get("name") or not tm.get("type"):
            raise ValueError(
                f"{p}: topics_with_message_count entry without "
                f"topic_metadata.name/type: {t!r}")
        topics.append({"name": tm["name"], "type": tm["type"],
                       "serialization_format":
                           tm.get("serialization_format", "cdr"),
                       "message_count": t.get("message_count")})
    return {"storage_identifier": storage,
            "relative_file_paths": list(rel),
            "compression_format": cfmt,
            "compression_mode": cmode.lower(),
            "message_count": info.get("message_count"),
            "duration_ns": (info.get("duration") or {}).get(
                "nanoseconds"),
            "starting_time_ns": (info.get("starting_time") or {}).get(
                "nanoseconds_since_epoch"),
            "topics": topics}


def load_definitions_dir(path: str) -> dict[str, str]:
    """A ``.msg``-bundle directory → ``definitions`` mapping for the
    db3 extractor: every ``*.msg`` file keyed by its relative path
    without the extension (``std_msgs/msg/String.msg`` →
    ``std_msgs/msg/String``); flattened ``pkg__msg__Type.msg`` names
    are accepted too. Driver-side, model-sized (interface texts, not
    data)."""
    if not os.path.isdir(path):
        raise FileNotFoundError(f"definitions_dir {path!r} is not a "
                                f"directory")
    out: dict[str, str] = {}
    for root, _, files in os.walk(path):
        for fn in files:
            if not fn.endswith(".msg"):
                continue
            full = os.path.join(root, fn)
            key = os.path.relpath(full, path)[:-4].replace(os.sep, "/")
            key = key.replace("__", "/")
            with open(full, encoding="utf-8") as f:
                out[key] = f.read()
    if not out:
        raise ValueError(f"definitions_dir {path!r} holds no .msg "
                         f"files")
    return out


def read_rosbag2(spark: SparkSession, recording_dir: str, *,
                 definitions: dict[str, str] | None = None,
                 definitions_dir: str | None = None,
                 on_error: str = "fail") -> DataFrame:
    """Zero-config ingest of a rosbag2 recording directory: the
    sidecar names the storage plugin, splits, topics, and compression;
    this routes to the matching extractor over EXACTLY the listed
    split files and returns the long message frame
    (:data:`~.db3.DB3_MESSAGE_SCHEMA` / MCAP twin) ready for
    :func:`~.mcap.decode_cdr_messages` /
    :func:`~.mcap.extract_mcap_topics`.

    ``definitions_dir`` (a ``.msg`` bundle) and/or ``definitions``
    feed the db3 extractor's type→text mapping (explicit entries win);
    MCAP recordings carry their definitions in-file and need neither.
    """
    meta = rosbag2_metadata(recording_dir)
    defs = {}
    if definitions_dir is not None:
        defs.update(load_definitions_dir(definitions_dir))
    if definitions:
        defs.update(definitions)
    paths = [os.path.join(recording_dir, x)
             for x in meta["relative_file_paths"]]
    files = (spark.read.format("binaryFile").load(paths)
             .select("path", "content"))
    if meta["storage_identifier"] == "sqlite3":
        return db3_messages_frame(
            files, definitions=defs or None, on_error=on_error,
            message_compression=(meta["compression_format"] or None
                                 if meta["compression_mode"]
                                 == "message" else None))
    if meta["compression_mode"] == "message":
        raise NotImplementedError(
            "rosbag2 message-mode compression over mcap storage is "
            "not supported by the builtin reader (rosbag2 itself "
            "compresses whole files or relies on MCAP chunk "
            "compression for mcap storage)")
    if meta["compression_mode"] == "file":
        files = _decompress_files(files)
    return mcap_messages_frame(files, on_error=on_error)


def _decompress_files(files: DataFrame) -> DataFrame:
    """Whole-file zstd layer (``compression_mode: file`` over mcap
    storage) — executor-side, decoded builtin via
    :mod:`..functions.zstd` (RFC 8878, r14; the optional
    ``zstandard`` package accelerates when installed). db3 images
    need no such pass: the parser magic-sniffs ``.db3.zstd``
    itself."""
    from collections.abc import Iterator

    import pandas as pd

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.zstd import decompress as _zstd

        def dec1(path, c):
            b = bytes(c)
            if b[:4] != b"\x28\xb5\x2f\xfd":
                return c
            try:
                return _zstd(b, max_output=1 << 31)
            except Exception as e:  # noqa: BLE001 — name the split
                raise ValueError(
                    f"{path}: corrupt zstd split "
                    f"(compression_mode: file): {e}") from e

        for pdf in batches:
            pdf = pdf.copy()
            pdf["content"] = [dec1(p, c) for p, c in
                              zip(pdf["path"], pdf["content"])]
            yield pdf

    return files.mapInPandas(dec, files.schema)
