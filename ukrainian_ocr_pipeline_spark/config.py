"""Job configuration: nested YAML/JSON config files with CLI overrides.

Twin of the reference's OCRPipelineConfig surface
(ukrainian_ocr/core/config.py:82-127 `from_file`/`from_dict`/`to_dict`,
cli.py:38-52 config load + per-flag overrides) recast for the web-text
job.  Only knobs the engine actually honors are exposed — every field
threads into extract_pages / the SnapshotCatalog write path; there are
no decorative options.

Unknown keys are REJECTED (the reference's dataclass **kwargs raise the
same way), so a typo'd threshold fails at load time, not by silently
running with defaults.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class MatchingConfig:
    """Fuzzy lexicon matching (spec/lexicon.py; reference
    core/surname_matcher.py:405-419 SurnameMatchingConfig twin)."""
    enabled: bool = True
    threshold: float = 0.8
    min_length: int = 3
    lexicon_path: str | None = None  # file of terms, one per line

    def load_lexicon(self) -> list[str] | None:
        if not self.lexicon_path:
            return None
        with open(self.lexicon_path, encoding="utf-8") as fh:
            return [line.strip() for line in fh if line.strip()]


@dataclass
class NERConfig:
    """Entity tagging (spec/ner.py; reference core/ner.py NERConfig
    twin).  `backend` is a registered name in NER_BACKENDS."""
    enabled: bool = True
    backend: str = "rule"


VALID_MODES = ("staged", "packed", "arrow")


@dataclass
class ExtractionConfig:
    """Pipeline shape knobs (operators/extract.py)."""
    # arrow (mapInArrow) is the throughput default: byte-identical to
    # packed (golden-pinned), but skips the pandas<->Arrow nested-struct
    # conversion both ways, which wins ~2x when the box is
    # memory-bandwidth bound (bench_out/mode_ab_r3.json) and ties
    # otherwise.  packed/staged stay as variants (staged exposes the
    # per-block `seg` struct for blocks_table).
    mode: str = "arrow"            # staged | packed | arrow
    with_regions: bool = True
    salt_buckets: int | None = None

    def __post_init__(self):
        # a typo'd mode must fail at load time — extract_pages would
        # otherwise silently fall through to the staged path
        if self.mode not in VALID_MODES:
            raise ValueError(
                f"extraction.mode must be one of {VALID_MODES}, "
                f"got {self.mode!r}")


@dataclass
class JobConfig:
    """Top-level job config for jobs/extract.py."""
    pages: str | None = None
    warehouse: str | None = None
    snapshot_id: str | None = None
    buckets: int = 64
    master: str | None = None
    extraction: ExtractionConfig = field(default_factory=ExtractionConfig)
    matching: MatchingConfig = field(default_factory=MatchingConfig)
    ner: NERConfig = field(default_factory=NERConfig)

    _SECTIONS = {"extraction": ExtractionConfig, "matching": MatchingConfig,
                 "ner": NERConfig}

    @classmethod
    def from_dict(cls, d: dict) -> "JobConfig":
        d = dict(d or {})
        kwargs = {}
        for name, sub_cls in cls._SECTIONS.items():
            sub = d.pop(name, {}) or {}  # empty YAML section parses as None = defaults
            _check_keys(sub_cls, sub, section=name)
            kwargs[name] = sub_cls(**sub)
        _check_keys(cls, d, section=None,
                    extra_ok=set(cls._SECTIONS))
        return cls(**d, **kwargs)

    @classmethod
    def from_file(cls, path: str | Path) -> "JobConfig":
        path = Path(path)
        if not path.exists():
            raise FileNotFoundError(f"config file not found: {path}")
        text = path.read_text(encoding="utf-8")
        if path.suffix.lower() == ".json":
            data = json.loads(text)
        else:  # .yaml / .yml (reference default: core/config.py:91-99)
            import yaml
            data = yaml.safe_load(text)
        if not isinstance(data, dict):
            raise ValueError(f"config root must be a mapping: {path}")
        return cls.from_dict(data)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def _check_keys(cls, d: dict, section: str | None, extra_ok: set | None = None):
    if not isinstance(d, dict):
        where = section or "top level"
        raise ValueError(f"config section {where!r} must be a mapping, got {type(d).__name__}")
    allowed = {f.name for f in dataclasses.fields(cls)} | (extra_ok or set())
    unknown = set(d) - allowed
    if unknown:
        where = f"section {section!r}" if section else "top level"
        raise ValueError(
            f"unknown config keys at {where}: {sorted(unknown)}; "
            f"allowed: {sorted(allowed)}")
