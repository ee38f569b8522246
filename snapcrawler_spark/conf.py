"""Crawl/filter configuration.

Field defaults mirror the reference's shipped config
(/root/reference/config.yaml): images.* at config.yaml:6-37, crawling.*
at config.yaml:77-90. The reference's YAML tree is job configuration,
not data — here it is an explicit dataclass whose values become literal
predicates at plan-build time (Catalyst constant-folds them).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Retry policy (reference: settings.py:84-85 — RETRY_HTTP_CODES and
# RETRY_TIMES): transient statuses re-enter the frontier with
# attempt+1 <= MAX_RETRIES.
RETRYABLE_STATUSES = (500, 502, 503, 504, 408, 429)
MAX_RETRIES = 3

# CAPTCHA detection (reference: middlewares.py:109-157): a response is a
# CAPTCHA challenge when status == 403 or its body contains one of these
# markers; such responses are dropped (IgnoreRequest) — no retry, no
# extraction — and tallied with outcome='captcha' in the fetch lineage.
CAPTCHA_INDICATORS = (
    "captcha", "recaptcha", "hcaptcha", "cloudflare",
    "please verify", "human verification", "robot check",
)


@dataclass(frozen=True)
class CrawlConfig:
    # crawling (config.yaml:44-90)
    seeds: tuple[str, ...] = ()
    max_depth: int = 5            # 0 = unlimited; pages at depth>=max skipped
    max_requests: int = 0         # 0 = unlimited
    min_commons_thumb_px: int | None = None  # falls back to min_side, then 300

    # images / filtering (config.yaml:6-37)
    min_side_size: int = 400
    formats: tuple[str, ...] = ("jpg", "jpeg", "png", "webp")
    min_dpi: int = 0
    color_mode: str = "all"       # 'color' | 'bw' | 'all'
    orientation: str = "all"      # 'landscape' | 'portrait' | 'square' | 'all'
    aspect_ratio_min: float = 0.4
    aspect_ratio_max: float = 3.0
    deduplication: bool = False   # config.yaml:15 ships false (code default True)
    watermark_enabled: bool = False
    # banner/logo filter (pipelines.py:240-252 _is_valid_aspect_ratio):
    # extreme aspect ratios (>10 or <0.1) reject as 'banner_logo' when
    # False. Defaults True = filter OFF, matching the reference's
    # .get('allow_logos_banners', True) AND the parallel-mode chain,
    # which never calls the check (SURVEY §7.3.5 parity).
    allow_logos_banners: bool = True

    # limits (config.yaml:221-224)
    max_images: int = 0           # 0 = unlimited
    max_folder_bytes: int = 0     # 0 = unlimited (max_folder_size_mb analog)

    # engine-only scale knobs (no reference analog; SURVEY §7)
    host_budget: int = 64         # max fetches per host per wave (wave mode)
    seen_partitions: int = 64     # bloom seen-set partition count
    bloom_bits_per_key: int = 10
    hot_host_salt: int = 8        # salt fan-out for hot hosts
    # default is the fully relational scale path; 'strict' (driver
    # replay of exact reference FIFO order) remains the bit-exactness
    # oracle mode for parity tests
    ordering: str = "wave"        # 'wave' | 'strict' (reference replay)

    extra: dict = field(default_factory=dict, compare=False)

    @property
    def norm_orientation(self) -> str:
        """Scrapy-chain synonyms (pipelines.py:194-197): vertical →
        portrait, horizontal → landscape."""
        return {"vertical": "portrait", "horizontal": "landscape"}.get(
            self.orientation, self.orientation
        )

    @property
    def norm_color_mode(self) -> str:
        """pipelines.py:180 defaults to 'any' where filtering_module
        uses 'all' — both mean no color filtering."""
        return "all" if self.color_mode == "any" else self.color_mode

    @property
    def thumb_min_px(self) -> int:
        if self.min_commons_thumb_px is not None:
            return int(self.min_commons_thumb_px)
        if self.min_side_size:
            return int(self.min_side_size)
        return 300
