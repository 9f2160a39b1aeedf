"""Layered configuration files — the LINZ::Config surface the
reference CLI is driven by.

A migrating user's first artifact is their existing
``linz_bde_uploader.conf``; this module reads it directly:

- ``-config-path``/``-config-extension`` semantics from
  bin/linz_bde_uploader.pl:80-81, behavior spec
  t/linz_bde_uploader.t:94-317: the main file is read first, then
  ``<cfgpath>.<extension>`` when an extension is given, then
  ``<cfgpath>.test`` LAST (read by default when present, overriding
  everything — the reference test-suite override channel).
- Syntax per conf/linz_bde_uploader.conf: ``key value`` lines
  (value may be empty), heredocs ``key <<MARKER`` ... ``MARKER``,
  ``#`` comments outside heredocs.
- ``{name}`` interpolates other config values;
  ``{_configdir}``/``{_configpath}``/``{_homedir}``/``{_hostname}``
  are built-ins (conf:114,118 use the first two). Double-braced
  ``{{id}}``-style tokens are RUNTIME placeholders (hook/SQL job-id
  substitution, conf:155-161) and pass through untouched.
"""

from __future__ import annotations

import os
import re
import socket
from dataclasses import replace

from linz_bde_uploader_spark.sources.crs import CleanseConfig


class ConfigError(Exception):
    """Unreadable or malformed configuration."""


_HEREDOC = re.compile(r"^\s*(\w+)\s+<<\s*(\S+)\s*$")
_KEYVAL = re.compile(r"^\s*(\w+)(?:\s+(.*?))?\s*$")


def parse_conf_text(text: str) -> dict[str, str]:
    """Parse one conf file's text into a key -> raw-value dict.
    Later duplicate keys win (that is what makes layering work —
    an override file is just concatenation-order precedence)."""
    out: dict[str, str] = {}
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        i += 1
        stripped = line.strip()
        if not stripped or stripped.startswith("#"):
            continue
        m = _HEREDOC.match(line)
        if m:
            key, marker = m.group(1), m.group(2)
            body: list[str] = []
            while i < len(lines) and lines[i].strip() != marker:
                body.append(lines[i])
                i += 1
            if i >= len(lines):
                raise ConfigError(
                    f"unterminated heredoc for '{key}' (missing {marker})")
            i += 1  # consume the marker line
            out[key] = "\n".join(body)
            continue
        m = _KEYVAL.match(line)
        if m:
            out[m.group(1)] = (m.group(2) or "").strip()
    return out


def _interpolate(conf: dict[str, str], cfgpath: str) -> dict[str, str]:
    """Expand ``{name}`` references against the merged config plus
    the built-in ``_configdir``-style variables, preserving
    ``{{...}}`` runtime placeholders verbatim."""
    specials = {
        "_configdir": os.path.dirname(os.path.abspath(cfgpath)),
        "_configpath": os.path.abspath(cfgpath),
        "_homedir": os.path.expanduser("~"),
        "_hostname": socket.gethostname(),
    }
    lookup = {**specials, **conf}
    token = re.compile(r"\{(\w+)\}")
    sentinel_l, sentinel_r = "\x00L\x00", "\x00R\x00"

    def expand(value: str, depth: int = 0) -> str:
        if depth > 8:  # cyclic reference guard
            return value
        protected = value.replace("{{", sentinel_l).replace("}}", sentinel_r)

        def sub(m: re.Match) -> str:
            name = m.group(1)
            if name in lookup:
                return expand(lookup[name], depth + 1)
            return m.group(0)

        return (token.sub(sub, protected)
                .replace(sentinel_l, "{{").replace(sentinel_r, "}}"))

    return {k: expand(v) for k, v in conf.items()}


def load_conf(cfgpath: str, extension: str | None = None,
              include_test: bool = True) -> dict[str, str]:
    """Read the layered configuration rooted at ``cfgpath``.

    Layer order (last wins): main file, ``<cfgpath>.<extension>``
    (required when requested), ``<cfgpath>.test`` (optional, always
    last — t/linz_bde_uploader.t:268-301)."""
    if not os.path.isfile(cfgpath):
        raise ConfigError(f"Cannot open configuration file {cfgpath}")
    merged: dict[str, str] = {}
    with open(cfgpath) as fh:
        merged.update(parse_conf_text(fh.read()))
    if extension:
        ext_path = f"{cfgpath}.{extension}"
        if not os.path.isfile(ext_path):
            raise ConfigError(f"Cannot open configuration file {ext_path}")
        with open(ext_path) as fh:
            merged.update(parse_conf_text(fh.read()))
    test_path = f"{cfgpath}.test"
    if include_test and os.path.isfile(test_path):
        with open(test_path) as fh:
            merged.update(parse_conf_text(fh.read()))
    return _interpolate(merged, cfgpath)


# ---------------------------------------------------------------- mapping

# reference hook keys (conf:168-192) -> driver event names
_HOOK_KEYS = {
    "start_event_hooks": "start",
    "finish_event_hooks": "finish",
    "error_event_hooks": "error",
    "start_dataset_event_hooks": "start_dataset",
    "finish_dataset_event_hooks": "finish_dataset",
}


def hooks_from_conf(conf: dict[str, str]) -> dict[str, list[str]]:
    """X3 shell hooks: one command per non-empty heredoc line."""
    hooks: dict[str, list[str]] = {}
    for key, event in _HOOK_KEYS.items():
        cmds = [ln.strip() for ln in conf.get(key, "").splitlines()
                if ln.strip() and not ln.strip().startswith("#")]
        if cmds:
            hooks[event] = cmds
    return hooks


def conf_table_lists(conf: dict[str, str]) -> tuple[list[str], list[str]]:
    """include_tables / exclude_tables heredocs (conf:198,296) as
    lowercase name lists; unknown names are silently ignored by the
    caller, matching the reference."""
    def names(key: str) -> list[str]:
        return [w.lower() for ln in conf.get(key, "").splitlines()
                for w in ln.split() if not w.startswith("#")]
    return names("include_tables"), names("exclude_tables")


def _flt(conf: dict[str, str], key: str, default: float) -> float:
    try:
        return float(conf[key])
    except (KeyError, ValueError):
        return default


_SQL_HOOK_KEYS = {
    "db_connect_sql": "connect",
    "dataset_load_start_sql": "dataset_start",
    "dataset_load_end_sql": "dataset_end",
    "db_upload_complete_sql": "upload_complete",
}


def sql_hooks_from_conf(conf: dict[str, str]) -> dict[str, str]:
    """X2 SQL hook blocks (conf:49-83) -> driver event names, with the
    reference's ``{{id}}`` runtime placeholder normalized to the
    ``{id}`` spelling control/hooks.py substitutes."""
    out = {}
    for key, event in _SQL_HOOK_KEYS.items():
        block = conf.get(key, "")
        if block.strip():
            out[event] = block.replace("{{id}}", "{id}")
    return out


def upload_config_from_conf(conf: dict[str, str], *,
                            enable_hooks: bool = False,
                            keep_files: bool = False):
    """Build the driver's UploadConfig from a parsed reference conf:
    continuity tolerances (conf:133-134), the completeness gate
    (conf:139), runtime budgets (conf:148-149), event hooks
    (conf:168-192), and the embedded bde_copy cleanse block
    (conf:349-421, parsed by CleanseConfig.from_conf_block).
    ``max_file_errors`` (conf:143) feeds the cleanse error budget
    unless the bde_copy block sets its own ``max_errors``."""
    from linz_bde_uploader_spark.driver import UploadConfig

    block = conf.get("bde_copy_configuration", "")
    cleanse = CleanseConfig.from_conf_block(block) if block.strip() \
        else CleanseConfig()
    if "max_errors" not in block and "max_file_errors" in conf:
        cleanse = replace(cleanse,
                          max_errors=int(_flt(conf, "max_file_errors",
                                              cleanse.max_errors)))
    return UploadConfig(
        cleanse=cleanse,
        level5_starttime_warn_tolerance=_flt(
            conf, "level5_starttime_warn_tolerance", 0.5),
        level5_starttime_fail_tolerance=_flt(
            conf, "level5_starttime_fail_tolerance", 0.0),
        require_all_dataset_files=conf.get(
            "require_all_dataset_files", "1").strip() not in ("0", ""),
        # the reference DEFAULTS this on when the key is absent
        # ($cfg->use_dataset_transaction(1), lib/LINZ/BdeDatabase.pm)
        # — a conf-driven run gets dataset transactions exactly as
        # the reference would even for confs that omit the key;
        # explicit-path CLI runs without a conf keep per-table
        # commits. Truthiness is Perl's, deliberately: only "0" and
        # "" are false (a conf saying "false" is ON in the reference
        # too — bug-for-bug conf compatibility).
        use_dataset_transaction=conf.get(
            "use_dataset_transaction", "1").strip() not in ("0", ""),
        max_level0_runtime_hours=_flt(conf, "max_level0_runtime_hours", 0.0),
        max_level5_runtime_hours=_flt(conf, "max_level5_runtime_hours", 0.0),
        hooks=hooks_from_conf(conf),
        enable_hooks=enable_hooks,
        sql_hooks=sql_hooks_from_conf(conf),
        keep_files=keep_files,
    )


def tables_conf_path(conf: dict[str, str], cfgpath: str) -> str:
    """bde_tables_config, defaulting to ``<configdir>/tables.conf``
    exactly like bin/linz_bde_uploader.pl:236-239."""
    return (conf.get("bde_tables_config")
            or os.path.join(os.path.dirname(os.path.abspath(cfgpath)),
                            "tables.conf"))
