"""Deterministic synthetic fixtures (seed=42, no network, no external data).

Pure functions of (seed, scale) per FIXTURES.md: an image corpus in the
mandated input-table shape and a synthetic web (pages/links/page_images/
robots/seeds) whose HTML embeds exactly the tabulated links/images, so
the engine's HTML-regexp extraction and its table-join extraction can be
cross-checked against each other and against the oracle.
"""

from snapcrawler_spark.fixtures.images import generate_images  # noqa: F401


def load_fixture(seed: int = 42, scale: str = "xs") -> dict:
    """All fixture tables (images, images_pixels, pages, links, page_items,
    image_fetch, robots, seeds) as pandas DataFrames — pure function of
    (seed, scale)."""
    from snapcrawler_spark.fixtures.images import generate_images as _gi
    from snapcrawler_spark.fixtures.web import SCALES, generate_web

    images, pixels = _gi(seed, SCALES[scale]["images"])
    web = generate_web(seed, scale, images_df=images)
    web["images_pixels"] = pixels
    return web
