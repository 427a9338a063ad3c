"""Raft consensus for the meta service.

The reference replicates its meta service with raft (`databend-meta`,
reference Cargo.toml:170 — openraft under the hood; the query side only
sees the KV API). This module is a compact, complete Raft core for the
TPU-native meta process: leader election with randomized timeouts, log
replication with per-peer nextIndex backtracking, majority commit, a
deterministic KV apply, and durable term/vote/log state (sqlite) so a
restarted node catches up from its own log before pulling the rest from
the leader.

Scope notes (documented simplifications vs a production raft):
* static membership (the --raft-peers list), no joint consensus
* no log compaction / snapshot install (meta logs are small; the KV
  state machine itself persists via the store's sqlite)
* reads are served by the leader without a read-index round; a deposed
  leader serves at-most-stale-by-one-election-timeout reads

Every mutation is a log entry ``{op, body}``; CAS failures are
legitimate *applied results* (no state change), so replicas stay
identical and the proposing client gets the TableVersionMismatched it
would have gotten from the embedded store.
"""

from __future__ import annotations

import json
import os
import random
import sqlite3
import threading
import time
import urllib.error
import urllib.request
from typing import Any, Callable, Dict, List, Optional, Tuple

FOLLOWER, CANDIDATE, LEADER = "follower", "candidate", "leader"


class RaftLog:
    """Durable raft state: log entries + (term, votedFor). 1-based
    indexing; entry 0 is a sentinel with term 0."""

    def __init__(self, path: Optional[str] = None):
        self._lock = threading.RLock()
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._db = sqlite3.connect(path, check_same_thread=False)
            self._db.execute("CREATE TABLE IF NOT EXISTS raft_log "
                             "(idx INTEGER PRIMARY KEY, term INTEGER, "
                             "op TEXT)")
            self._db.execute("CREATE TABLE IF NOT EXISTS raft_meta "
                             "(k TEXT PRIMARY KEY, v TEXT)")
            self._db.commit()
            rows = self._db.execute(
                "SELECT idx, term, op FROM raft_log ORDER BY idx").fetchall()
            self._entries = [(0, None)] + [
                (t, json.loads(op)) for _, t, op in rows]
            tv = dict(self._db.execute(
                "SELECT k, v FROM raft_meta").fetchall())
            self.term = int(tv.get("term", 0))
            self.voted_for = tv.get("voted_for") or None
        else:
            self._db = None
            self._entries = [(0, None)]
            self.term = 0
            self.voted_for = None

    def save_term_vote(self, term: int, voted_for: Optional[str]):
        with self._lock:
            self.term = term
            self.voted_for = voted_for
            if self._db is not None:
                self._db.execute(
                    "INSERT INTO raft_meta (k, v) VALUES ('term', ?) "
                    "ON CONFLICT(k) DO UPDATE SET v=?", (str(term), str(term)))
                self._db.execute(
                    "INSERT INTO raft_meta (k, v) VALUES ('voted_for', ?) "
                    "ON CONFLICT(k) DO UPDATE SET v=?",
                    (voted_for or "", voted_for or ""))
                self._db.commit()

    def last_index(self) -> int:
        return len(self._entries) - 1

    def term_at(self, idx: int) -> int:
        return self._entries[idx][0]

    def entry(self, idx: int):
        return self._entries[idx]

    def append(self, term: int, op: dict) -> int:
        with self._lock:
            self._entries.append((term, op))
            idx = len(self._entries) - 1
            if self._db is not None:
                self._db.execute(
                    "INSERT INTO raft_log (idx, term, op) VALUES (?, ?, ?)",
                    (idx, term, json.dumps(op)))
                self._db.commit()
            return idx

    def truncate_from(self, idx: int):
        """Drop entries >= idx (conflict resolution on followers)."""
        with self._lock:
            del self._entries[idx:]
            if self._db is not None:
                self._db.execute("DELETE FROM raft_log WHERE idx >= ?",
                                 (idx,))
                self._db.commit()

    def close(self):
        if self._db is not None:
            self._db.close()


class RaftNode:
    """One raft participant. ``apply_fn(op_dict) -> result`` is the
    deterministic state-machine apply (the meta KV mutation)."""

    def __init__(self, node_id: str, peers: Dict[str, str],
                 apply_fn: Callable[[dict], Any],
                 log_path: Optional[str] = None,
                 election_timeout: Tuple[float, float] = (0.4, 0.8),
                 heartbeat: float = 0.12):
        self.id = node_id
        self.peers = {k: v for k, v in peers.items() if k != node_id}
        self.apply_fn = apply_fn
        self.log = RaftLog(log_path)
        self.role = FOLLOWER
        self.leader_id: Optional[str] = None
        self.commit_index = 0
        self.last_applied = 0
        self.next_index: Dict[str, int] = {}
        self.match_index: Dict[str, int] = {}
        self._results: Dict[int, Any] = {}
        self._lock = threading.RLock()
        self._apply_cv = threading.Condition(self._lock)
        self._election_timeout = election_timeout
        self._heartbeat = heartbeat
        self._deadline = time.monotonic() + self._rand_timeout()
        self._stopped = False
        self._threads = [
            threading.Thread(target=self._ticker, daemon=True),
        ]
        for t in self._threads:
            t.start()

    # ------------------------------------------------------------- helpers
    def _rand_timeout(self) -> float:
        lo, hi = self._election_timeout
        return random.uniform(lo, hi)

    def _majority(self) -> int:
        return (len(self.peers) + 1) // 2 + 1

    def _rpc(self, peer_ep: str, path: str, body: dict,
             timeout: float = 0.5) -> Optional[dict]:
        req = urllib.request.Request(
            f"{peer_ep}/v1/raft/{path}", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return json.loads(r.read())
        except Exception:
            return None

    # ------------------------------------------------------------ lifecycle
    def stop(self):
        with self._lock:
            self._stopped = True
            self._apply_cv.notify_all()

    def _ticker(self):
        while True:
            time.sleep(self._heartbeat / 2)
            with self._lock:
                if self._stopped:
                    return
                role = self.role
                expired = time.monotonic() >= self._deadline
            if role == LEADER:
                self._replicate_all()
            elif expired:
                self._start_election()

    # ------------------------------------------------------------- election
    def _start_election(self):
        with self._lock:
            self.role = CANDIDATE
            term = self.log.term + 1
            self.log.save_term_vote(term, self.id)
            self.leader_id = None
            self._deadline = time.monotonic() + self._rand_timeout()
            last_idx = self.log.last_index()
            last_term = self.log.term_at(last_idx)
        votes = [1]  # self
        done = threading.Event()

        def ask(pid, ep):
            out = self._rpc(ep, "request_vote", {
                "term": term, "candidate": self.id,
                "last_log_index": last_idx, "last_log_term": last_term})
            if out is None:
                return
            with self._lock:
                if out["term"] > self.log.term:
                    self._become_follower(out["term"], None)
                    done.set()
                    return
                if out.get("granted") and self.role == CANDIDATE \
                        and self.log.term == term:
                    votes[0] += 1
                    if votes[0] >= self._majority():
                        self._become_leader()
                        done.set()

        ts = [threading.Thread(target=ask, args=(p, ep), daemon=True)
              for p, ep in self.peers.items()]
        for t in ts:
            t.start()
        done.wait(timeout=self._election_timeout[0])

    def _become_follower(self, term: int, leader: Optional[str]):
        self.role = FOLLOWER
        if term > self.log.term:
            self.log.save_term_vote(term, None)
        self.leader_id = leader
        self._deadline = time.monotonic() + self._rand_timeout()

    def _become_leader(self):
        self.role = LEADER
        self.leader_id = self.id
        nxt = self.log.last_index() + 1
        self.next_index = {p: nxt for p in self.peers}
        self.match_index = {p: 0 for p in self.peers}
        # no-op barrier entry: commits everything from prior terms once
        # replicated (raft §8's first-log-entry-of-term rule)
        self.log.append(self.log.term, {"op": "noop"})
        threading.Thread(target=self._replicate_all, daemon=True).start()

    # ---------------------------------------------------------- replication
    def _replicate_all(self):
        with self._lock:
            if self.role != LEADER:
                return
            peers = list(self.peers.items())
        ts = [threading.Thread(target=self._replicate_one, args=(p, ep),
                               daemon=True) for p, ep in peers]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=1.0)
        self._advance_commit()

    def _replicate_one(self, pid: str, ep: str):
        with self._lock:
            if self.role != LEADER:
                return
            term = self.log.term
            nxt = self.next_index.get(pid, self.log.last_index() + 1)
            prev = nxt - 1
            prev_term = self.log.term_at(prev) if prev <= self.log.last_index() else 0
            entries = [[self.log.term_at(i), self.log.entry(i)[1]]
                       for i in range(nxt, self.log.last_index() + 1)]
            body = {"term": term, "leader": self.id,
                    "prev_log_index": prev, "prev_log_term": prev_term,
                    "entries": entries, "leader_commit": self.commit_index}
        out = self._rpc(ep, "append_entries", body)
        if out is None:
            return
        with self._lock:
            if out["term"] > self.log.term:
                self._become_follower(out["term"], None)
                return
            if self.role != LEADER or self.log.term != term:
                return
            if out.get("success"):
                self.match_index[pid] = prev + len(entries)
                self.next_index[pid] = self.match_index[pid] + 1
            else:
                # conflict backtracking (follower hints its log length)
                hint = out.get("conflict_index")
                self.next_index[pid] = max(
                    1, hint if hint is not None else nxt - 1)

    def _advance_commit(self):
        with self._lock:
            if self.role != LEADER:
                return
            for n in range(self.log.last_index(), self.commit_index, -1):
                if self.log.term_at(n) != self.log.term:
                    break  # only current-term entries commit by counting
                count = 1 + sum(1 for p in self.peers
                                if self.match_index.get(p, 0) >= n)
                if count >= self._majority():
                    self.commit_index = n
                    self._apply_committed()
                    break

    def _apply_committed(self):
        while self.last_applied < self.commit_index:
            self.last_applied += 1
            _, op = self.log.entry(self.last_applied)
            if op is None or op.get("op") == "noop":
                result = None
            else:
                try:
                    result = {"ok": self.apply_fn(op)}
                except Exception as e:  # CAS failures are applied results
                    result = {"error": e}
            self._results[self.last_applied] = result
            if len(self._results) > 1024:  # followers never pop results
                for k in sorted(self._results)[:-512]:
                    self._results.pop(k, None)
        self._apply_cv.notify_all()

    # -------------------------------------------------------------- RPC in
    def handle_request_vote(self, body: dict) -> dict:
        with self._lock:
            term = body["term"]
            if term > self.log.term:
                self._become_follower(term, None)
            granted = False
            if term == self.log.term and \
                    self.log.voted_for in (None, body["candidate"]):
                last_idx = self.log.last_index()
                last_term = self.log.term_at(last_idx)
                up_to_date = (body["last_log_term"], body["last_log_index"]) \
                    >= (last_term, last_idx)
                if up_to_date:
                    granted = True
                    self.log.save_term_vote(term, body["candidate"])
                    self._deadline = time.monotonic() + self._rand_timeout()
            return {"term": self.log.term, "granted": granted}

    def handle_append_entries(self, body: dict) -> dict:
        with self._lock:
            term = body["term"]
            if term < self.log.term:
                return {"term": self.log.term, "success": False}
            self._become_follower(term, body["leader"])
            prev = body["prev_log_index"]
            if prev > self.log.last_index() or \
                    self.log.term_at(prev) != body["prev_log_term"]:
                return {"term": self.log.term, "success": False,
                        "conflict_index": min(prev,
                                              self.log.last_index() + 1)}
            idx = prev
            for eterm, eop in body["entries"]:
                idx += 1
                if idx <= self.log.last_index():
                    if self.log.term_at(idx) == eterm:
                        continue
                    self.log.truncate_from(idx)
                self.log.append(eterm, eop)
            if body["leader_commit"] > self.commit_index:
                self.commit_index = min(body["leader_commit"],
                                        self.log.last_index())
                self._apply_committed()
            return {"term": self.log.term, "success": True}

    # ------------------------------------------------------------- propose
    def propose(self, op: dict, timeout: float = 5.0):
        """Leader-only: append, replicate, wait for apply, return the
        state-machine result (re-raising CAS errors). Raises
        NotLeader on followers."""
        with self._lock:
            if self.role != LEADER:
                raise NotLeader(self.leader_id)
            term = self.log.term
            idx = self.log.append(term, op)
        self._replicate_all()
        deadline = time.monotonic() + timeout
        with self._lock:
            while self.last_applied < idx:
                if self._stopped or self.role != LEADER \
                        or self.log.term != term:
                    raise NotLeader(self.leader_id)
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    raise TimeoutError(
                        f"raft commit timeout at index {idx} "
                        f"(no majority reachable)")
                self._apply_cv.wait(timeout=min(remaining, 0.1))
            if self.log.term_at(idx) != term:
                raise NotLeader(self.leader_id)  # entry was overwritten
            result = self._results.pop(idx, None)
        if result and "error" in result:
            raise result["error"]
        return result["ok"] if result else None

    def status(self) -> dict:
        with self._lock:
            return {"id": self.id, "role": self.role, "term": self.log.term,
                    "leader": self.leader_id,
                    "commit_index": self.commit_index,
                    "last_applied": self.last_applied,
                    "log_len": self.log.last_index()}


class NotLeader(Exception):
    def __init__(self, leader_id: Optional[str]):
        super().__init__(f"not the raft leader (leader: {leader_id})")
        self.leader_id = leader_id
