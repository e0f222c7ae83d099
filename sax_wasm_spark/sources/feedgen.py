"""Deterministic RSS/Atom corpus twin for the feed-discovery oracle
(q89).

Feeds are the third crawl-frontier channel (robots.txt → q46,
Sitemaps → q65/q66, feeds → here): RSS 2.0 and Atom (RFC 4287) cycle
by doc parity so ONE operator proves both wire shapes — including the
structural difference that matters: RSS links are element TEXT, Atom
links are an ``href`` ATTRIBUTE on a void ``<link/>`` element.
Channel/feed-level title+link+date are DECOYS that must not leak into
item rows (they precede the first item/entry).

Closed forms (d = doc_id, items i in 0..n-1):

    n_items(d)  = 1 + d % 4
    fmt         = 'rss' when d even else 'atom'
    title(d,i)  = 'Item <i> feed <d % 1000>'
    link(d,i)   = 'https://h<(d+i) % 7>.example.com/e/<d % 1000>-<i>'
    published   : rss  'Mon, <dd> Jan 2024 <hh>:00:00 GMT'
                  atom '2024-01-<dd>T<hh>:00:00Z'
                  with dd = 1 + (d+i) % 28 (2-digit), hh = d % 24
    entry_id    = 'urn:<g|a>:<d % 1000>:<i>'  (rss guid / atom id)

The reference repo is an XML tokenizer with no feed surface
(``/root/reference/src/sax/parser.rs:1``); feeds are its native
ground applied to the crawl-frontier tier.
"""

from __future__ import annotations


def n_feed_items(doc_id: int) -> int:
    return 1 + doc_id % 4


def feed_fmt(doc_id: int) -> str:
    return "rss" if doc_id % 2 == 0 else "atom"


def feed_item(doc_id: int, i: int) -> dict:
    d = doc_id % 1000
    dd, hh = 1 + (doc_id + i) % 28, doc_id % 24
    fmt = feed_fmt(doc_id)
    return {
        "title": f"Item {i} feed {d}",
        "link": f"https://h{(doc_id + i) % 7}.example.com/e/{d}-{i}",
        "published": (
            f"Mon, {dd:02d} Jan 2024 {hh:02d}:00:00 GMT"
            if fmt == "rss"
            else f"2024-01-{dd:02d}T{hh:02d}:00:00Z"
        ),
        "entry_id": f"urn:{'g' if fmt == 'rss' else 'a'}:{d}:{i}",
    }


def build_feed(doc_id: int) -> bytes:
    """The feed document — RSS 2.0 (even doc_ids) or Atom (odd)."""
    n = n_feed_items(doc_id)
    if feed_fmt(doc_id) == "rss":
        items = []
        for i in range(n):
            it = feed_item(doc_id, i)
            items.append(
                "<item>"
                f"<title>{it['title']}</title>"
                f"<link>{it['link']}</link>"
                f"<pubDate>{it['published']}</pubDate>"
                f"<guid>{it['entry_id']}</guid>"
                "</item>"
            )
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<rss version="2.0"><channel>'
            f"<title>channel {doc_id % 1000}</title>"
            "<link>https://decoy.example.com/</link>"
            "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>"
            + "".join(items)
            + "</channel></rss>"
        )
    else:
        entries = []
        for i in range(n):
            it = feed_item(doc_id, i)
            entries.append(
                "<entry>"
                f"<title>{it['title']}</title>"
                f'<link href="{it["link"]}"/>'
                f"<updated>{it['published']}</updated>"
                f"<id>{it['entry_id']}</id>"
                "</entry>"
            )
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<feed xmlns="http://www.w3.org/2005/Atom">'
            f"<title>feed {doc_id % 1000}</title>"
            '<link href="https://decoy.example.com/"/>'
            "<updated>2024-01-01T00:00:00Z</updated>"
            + "".join(entries)
            + "</feed>"
        )
    return xml.encode("utf-8")
