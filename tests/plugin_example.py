"""Example content-handler plugin (the §2.10 extension recipe): adds a
byte-size field + magic sniff to every ``compressed`` doc."""

from playwrightcrawler_ray.stages.process import register_content_handler


def compressed_handler(url, body, content_type, ctx):
    magic = "zip" if body[:2] == b"PK" else ("gzip" if body[:2] == b"\x1f\x8b" else "unknown")
    return {
        "source": "content_type_compressed_plugin",
        "min_webcontent": f"archive:{magic}:{len(body)}",
    }


register_content_handler("compressed", compressed_handler)
