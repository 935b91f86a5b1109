#!/usr/bin/env python3
"""Deterministic raw-archive JSON fixture generator (NO randomness).

Writes src/test/resources/raw_archives/<user>_<YYYY-MM>.json — the
landed monthly-archive shape (`{"games": [...]}`) the chess.com API
returns and `graft.etl.ArchiveSource.readLanding` ingests. The games
cover every branch of the reference projection
(fetch_and_post.py:114-161): PGN `[Result]` header, movetext-token
fallback (last token wins), `"{white} / {black}"` side fallback
(including one-sided), empty result, null / missing `end_time`,
missing `white`/`black` sub-objects, missing url / time_control / pgn,
and one empty archive.

The q130 oracle re-derives the 13-column projection from these same
files with DuckDB `read_json` — regenerate with this script only; the
committed JSON is the contract.
"""
import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "raw_archives")


def game(i, user, month):
    """One deterministic game; `i` cycles the vocabularies."""
    g = {}
    # url: missing on every 9th game
    if i % 9 != 4:
        g["url"] = f"https://www.chess.com/game/live/{month}{i:03d}"
    # time_control cycles the full bucket vocabulary, missing every 7th
    tcs = ["60", "300", "300+5", "600", "1/86400", "custom"]
    if i % 7 != 5:
        g["time_control"] = tcs[i % 6]
    # end_time: missing on i%11==3, null on i%11==7, else a deterministic
    # epoch inside the archive month
    if i % 11 == 7:
        g["end_time"] = None
    elif i % 11 != 3:
        base = {"2024-01": 1704067200, "2024-02": 1706745600,
                "2024-03": 1709251200}[month]
        g["end_time"] = base + i * 86400 // 3 + i * 61
    # pgn: cycles header / token / multi-token / headerless / missing
    w_user = user if i % 2 == 0 else f"rival{i % 5}"
    b_user = f"rival{i % 5}" if i % 2 == 0 else user
    pgn_mode = i % 6
    if pgn_mode == 0:
        g["pgn"] = (f'[Event "Live Chess"]\n[White "{w_user}"]\n'
                    f'[Black "{b_user}"]\n[Result "1-0"]\n'
                    f'[ECO "B2{i % 10}"]\n\n1. e4 c5 2. Nf3 1-0')
    elif pgn_mode == 1:
        # header absent; LAST movetext token must win (0-1 then 1/2-1/2)
        g["pgn"] = ('[Event "Live Chess"]\n\n'
                    '1. d4 d5 {eval 0-1 was wrong} 2. c4 e6 1/2-1/2')
    elif pgn_mode == 2:
        g["pgn"] = (f'[Event "Live Chess"]\n[ECO "C0{i % 10}"]\n'
                    f'[Result "0-1"]\n\n1. e4 e5 2. Qh5 0-1')
    elif pgn_mode == 3:
        # empty-string header → falls through to the movetext token
        g["pgn"] = '[Result ""]\n\n1. Nf3 Nf6 1-0'
    elif pgn_mode == 4:
        # no header, no token → side-result fallback decides
        g["pgn"] = '[Event "Live Chess"]\n\n1. e4 (unterminated'
    # pgn_mode == 5: pgn missing entirely
    # white/black sub-objects: missing entirely on some games (P4's
    # null-coalescing chain), rating missing on others
    results = [("win", "checkmated"), ("checkmated", "win"),
               ("agreed", "agreed"), ("timeout", "win"),
               ("win", None), (None, "resigned"), (None, None)]
    wr, br = results[i % 7]
    if i % 13 != 6:
        side = {"username": w_user, "rating": 800 + (i * 37) % 1600}
        if i % 5 == 2:
            del side["rating"]
        if wr is not None:
            side["result"] = wr
        g["white"] = side
    if i % 13 != 9:
        side = {"username": b_user, "rating": 750 + (i * 53) % 1600}
        if i % 5 == 3:
            del side["rating"]
        if br is not None:
            side["result"] = br
        g["black"] = side
    return g


def main():
    os.makedirs(OUT, exist_ok=True)
    archives = [("alice", "2024-01", range(0, 18)),
                ("alice", "2024-02", range(18, 30)),
                ("bob", "2024-01", range(30, 43)),
                ("edge", "2024-03", range(0, 0))]  # empty archive
    for user, month, rng in archives:
        doc = {"games": [game(i, user, month) for i in rng]}
        path = os.path.join(OUT, f"{user}_{month}.json")
        with open(path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"wrote {path} ({len(doc['games'])} games)")


if __name__ == "__main__":
    main()
