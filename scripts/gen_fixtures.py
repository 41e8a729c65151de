"""Generate the committed Sparkify JSON fixtures (FIXTURES.md §A).

Deterministic (seeded) synthesis of the reference's two input datasets —
song_data (one JSON object per file, nested A/A/A-style dirs, sample at
reference README.md:23) and log_data (JSON-lines, dated files, sample at
README.md:33) — including every edge case FIXTURES.md calls for: null
lat/long, year=0, duplicate song_id across files, a malformed JSON line
(PERMISSIVE parse), non-NextSong pages, empty userId, a user with both
'free' and 'paid' levels, duplicate ts values, and exact
(song, length, artist) ⟷ (title, duration, artist_name) join hits.

Run once; output is committed under fixtures/sparkify/.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1] / "fixtures" / "sparkify"

rng = random.Random(42)

ARTISTS = [
    ("AR" + "".join(rng.choices("0123456789ABCDEF", k=16)), name, loc, lat, lon)
    for name, loc, lat, lon in [
        ("Line Renaud", "", None, None),
        ("The Box Tops", "Memphis, TN", 35.14968, -90.04892),
        ("Sonora Santanera", "", None, None),
        ("Adam Lambert", "Los Angeles, CA", 34.05223, -118.24368),
        ("Gustav Mahler", "Kaliste", 49.55, 15.43),
        ("Faye Adams", "Newark, NJ", None, None),
    ]
]

TITLES = [
    "Der Kleine Dompfaff",
    "Soul Deep",
    "Amor De Cabaret",
    "Whataya Want From Me",
    "Symphony No 1 G Major",
    "Shake A Hand",
    "Soul Deep",  # duplicate title, different artist (join must use all 3 keys)
    "Midnight Train",
]


def gen_songs() -> list[dict]:
    songs = []
    for i, title in enumerate(TITLES):
        aid, aname, aloc, alat, alon = ARTISTS[i % len(ARTISTS)]
        songs.append(
            {
                "num_songs": 1,
                "artist_id": aid,
                "artist_latitude": alat,
                "artist_longitude": alon,
                "artist_location": aloc,
                "artist_name": aname,
                "song_id": "SO" + "".join(rng.choices("0123456789ABCDEFGHIJ", k=16)),
                "title": title,
                "duration": round(rng.uniform(120, 360), 5),
                "year": rng.choice([0, 0, 1961, 1969, 1982, 2009]),
            }
        )
    return songs


def gen_logs(songs: list[dict]) -> list[dict]:
    users = [
        ("39", "Walter", "Frye", "M"),
        ("8", "Kaylee", "Summers", "F"),
        ("10", "Sylvie", "Cruz", "F"),
        ("26", "Ryan", "Smith", "M"),
        ("", None, None, None),  # empty userId edge case
    ]
    pages = ["NextSong"] * 6 + ["Home", "Login", "Logout", "Settings"]
    logs = []
    ts = 1541105830796
    for i in range(120):
        uid, first, last, gender = users[i % len(users)]
        page = pages[i % len(pages)]
        # user "8" flips level over time (dedup-nondeterminism edge, B7)
        level = "paid" if (uid == "8" and i > 50) or uid == "26" else "free"
        ts += rng.choice([0, 12000, 45000, 180000])  # includes duplicate ts
        row = {
            "artist": None,
            "auth": "Logged In" if uid else "Logged Out",
            "firstName": first,
            "gender": gender,
            "itemInSession": i % 7,
            "lastName": last,
            "length": None,
            "level": level,
            "location": "San Francisco-Oakland-Hayward, CA",
            "method": "PUT" if page == "NextSong" else "GET",
            "page": page,
            "registration": 1540919166796.0 if uid else None,
            "sessionId": 100 + (i // 7),
            "song": None,
            "status": 200,
            "ts": ts,
            "userAgent": '"Mozilla/5.0 (Macintosh; Intel Mac OS X 10_9_4)"',
            "userId": uid,
        }
        if page == "NextSong":
            if i % 3 == 0:  # exact join hit on (song, length, artist)
                s = songs[i % len(songs)]
                row.update(
                    artist=s["artist_name"], song=s["title"], length=s["duration"]
                )
            else:  # non-matching play (inner join must drop)
                row.update(artist="Unknown Artist", song="Unknown Song", length=199.99)
        logs.append(row)
    return logs


def gen_ppm_media() -> None:
    """Committed real-format media fixtures (round 7): three binary
    PGM/PPM files under fixtures/media/ for decode_real's pure-Python
    path (multimodal._decode_pnm) — a P6 RGB gradient, a P5 grayscale
    ramp, and a P6 with header comments (the format's parsing wrinkle).
    Deterministic: seeded independently of the Sparkify stream so
    regenerating either never perturbs the other. The existing *.img
    fixtures (fake-kernel header format) are untouched — every
    hash-proven q_multimodal_* oracle globs *.img only."""
    media = Path(__file__).resolve().parents[1] / "fixtures" / "media"
    media.mkdir(parents=True, exist_ok=True)
    mrng = random.Random(7)

    w, h = 16, 9
    raster = bytes(
        c
        for y in range(h)
        for x in range(w)
        for c in ((x * 255) // (w - 1), (y * 255) // (h - 1), mrng.randrange(256))
    )
    (media / "real_000.ppm").write_bytes(
        b"P6\n%d %d\n255\n" % (w, h) + raster
    )

    w2, h2 = 10, 10
    gray = bytes(((x + y * w2) * 255) // (w2 * h2 - 1) for y in range(h2) for x in range(w2))
    (media / "real_001.pgm").write_bytes(
        b"P5\n%d %d\n255\n" % (w2, h2) + gray
    )

    w3, h3 = 5, 4
    raster3 = bytes(mrng.randrange(256) for _ in range(w3 * h3 * 3))
    (media / "real_002.ppm").write_bytes(
        b"P6\n# comment line in header\n%d # trailing comment\n%d\n255\n"
        % (w3, h3)
        + raster3
    )


def main() -> None:
    gen_ppm_media()
    songs = gen_songs()
    # duplicate song_id across two files (dedup edge, etl.py:69)
    dup = dict(songs[0])
    for i, s in enumerate(songs + [dup]):
        sub = ROOT / "song_data" / "A" / "A" / ("A" if i % 2 else "B")
        sub.mkdir(parents=True, exist_ok=True)
        (sub / f"TR{i:05d}.json").write_text(json.dumps(s) + "\n")

    logs = gen_logs(songs)
    log_dir = ROOT / "log_data" / "2018" / "11"
    log_dir.mkdir(parents=True, exist_ok=True)
    half = len(logs) // 2
    (log_dir / "2018-11-12-events.json").write_text(
        "\n".join(json.dumps(r) for r in logs[:half]) + "\n"
    )
    # second file ends with a malformed line (PERMISSIVE parse, etl.py:61)
    (log_dir / "2018-11-13-events.json").write_text(
        "\n".join(json.dumps(r) for r in logs[half:]) + "\n{not valid json\n"
    )
    print(f"wrote {len(songs) + 1} song files, {len(logs)} log rows under {ROOT}")


if __name__ == "__main__":
    main()
