"""GitHub preset (docs/connectors.md:47) over the generic REST source:
endpoint routing, Link pagination, bearer auth, nested-field flattening
via field_paths — all against an in-process mock of the GitHub API."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

import strake_spark as ss

ISSUES = [
    {
        "id": 1000 + i,
        "number": i,
        "state": "closed" if i % 3 == 0 else "open",
        "title": f"issue {i}",
        "user": {"login": f"user{i % 4}"},
        "comments": i % 7,
        "created_at": "2026-01-01T00:00:00Z",
        "updated_at": "2026-02-01T00:00:00Z",
        "closed_at": None,
        "labels": [{"name": "bug"}],  # extra nested field: must be ignored
    }
    for i in range(1, 26)
]

COMMITS = [
    {
        "sha": f"c{i:03d}",
        "author": {"login": f"user{i % 2}"},
        "commit": {
            "author": {"name": f"User {i % 2}", "email": "u@example.com",
                       "date": "2026-03-01T00:00:00Z"},
            "committer": {"date": "2026-03-01T01:00:00Z"},
            "message": f"commit {i}",
        },
    }
    for i in range(12)
]

REPOS = [
    {
        "id": i,
        "name": f"repo{i}",
        "full_name": f"octo/repo{i}",
        "private": False,
        "fork": i % 2 == 0,
        "language": "Rust",
        "stargazers_count": i * 10,
        "forks_count": i,
        "open_issues_count": 2,
        "owner": {"login": "octo"},
        "created_at": "2025-01-01T00:00:00Z",
        "updated_at": "2025-06-01T00:00:00Z",
        "pushed_at": "2025-06-02T00:00:00Z",
    }
    for i in range(5)
]


class _GhHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        if self.path != "/graphql":
            return self._deny(404)
        if self.headers.get("Authorization") != "Bearer ghp_test":
            return self._deny()
        ln = int(self.headers.get("Content-Length", "0"))
        req = json.loads(self.rfile.read(ln))
        v = req.get("variables") or {}
        if v.get("owner") != "octo" or v.get("name") != "hello":
            return self._deny(404)
        assert "query(" in req.get("query", "")
        after = v.get("after")
        start = int(after) if after else 0
        nodes = [
            {
                "number": i,
                "state": "OPEN",
                "title": f"gql issue {i}",
                "author": {"login": f"user{i % 3}"},
                "comments": {"totalCount": i},
                "reactions": {"totalCount": 2 * i},
                "labels": {"totalCount": 1},
                "createdAt": "2026-01-01T00:00:00Z",
                "closedAt": None,
            }
            for i in range(start, min(start + 10, 23))
        ]
        has_next = start + 10 < 23
        return self._json({
            "data": {"repository": {"issues": {
                # endCursor stays non-null on the LAST page, like the
                # real API — the more_field stop must handle that
                "pageInfo": {"hasNextPage": has_next,
                             "endCursor": str(start + 10)},
                "nodes": nodes,
            }}}
        })

    def _json(self, payload, headers=None):
        body = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _deny(self, code=401):
        self.send_response(code)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def _paged(self, rows, path, q):
        page = int(q.get("page", ["1"])[0])
        per = int(q.get("per_page", ["100"])[0])
        start = (page - 1) * per
        chunk = rows[start : start + per]
        headers = {}
        if start + per < len(rows):
            host = self.headers["Host"]
            headers["Link"] = f'<http://{host}{path}?page={page + 1}&per_page={per}>; rel="next"'
        return self._json(chunk, headers)

    def do_GET(self):
        u = urlparse(self.path)
        q = parse_qs(u.query)
        if self.headers.get("Accept") != "application/vnd.github+json":
            return self._deny(406)
        if u.path == "/repos/octo/hello/issues":
            if q.get("state", [None])[0] != "all":
                return self._deny(400)
            # force pagination: 10 per page regardless of per_page
            page = int(q.get("page", ["1"])[0])
            start = (page - 1) * 10
            chunk = ISSUES[start : start + 10]
            headers = {}
            if start + 10 < len(ISSUES):
                host = self.headers["Host"]
                headers["Link"] = (
                    f'<http://{host}{u.path}?state=all&page={page + 1}>; rel="next"'
                )
            return self._json(chunk, headers)
        if u.path == "/repos/octo/hello/commits":
            return self._paged(COMMITS, u.path, q)
        if u.path == "/orgs/octo/repos":
            return self._paged(REPOS, u.path, q)
        if u.path == "/repos/octo/private/issues":
            if self.headers.get("Authorization") != "Bearer ghp_test":
                return self._deny()
            return self._json(ISSUES[:3])
        return self._deny(404)


@pytest.fixture(scope="module")
def gh():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _GhHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


class TestGithubPreset:
    def test_issues_pagination_and_flattening(self, spark, gh):
        eng = ss.connect(
            {"sources": [{"name": "gh", "type": "github", "url": gh,
                          "options": {"repo": "octo/hello"},
                          "tables": [{"name": "issues"}]}]},
            spark=spark,
        )
        df = eng.sql("SELECT number, state, user_login, comments FROM gh_issues")
        rows = df.collect()
        assert len(rows) == 25  # 3 Link-header pages followed
        by_num = {r.number: r for r in rows}
        assert by_num[3].state == "closed" and by_num[4].state == "open"
        assert by_num[5].user_login == "user1"  # nested user.login flattened

    def test_commits_deep_paths(self, spark, gh):
        eng = ss.connect(
            {"sources": [{"name": "gh2", "type": "github", "url": gh,
                          "options": {"repo": "octo/hello"},
                          "tables": [{"name": "commits"}]}]},
            spark=spark,
        )
        rows = eng.sql(
            "SELECT sha, author_name, message FROM gh2_commits ORDER BY sha"
        ).collect()
        assert len(rows) == 12
        assert rows[0].author_name == "User 0"
        assert rows[1].message == "commit 1"

    def test_repos_needs_org_and_routes(self, spark, gh):
        eng = ss.connect(
            {"sources": [{"name": "gh3", "type": "github", "url": gh,
                          "options": {"org": "octo"},
                          "tables": [{"name": "repos"}]}]},
            spark=spark,
        )
        rows = eng.sql(
            "SELECT full_name, owner_login, stargazers_count FROM gh3_repos"
        ).collect()
        assert len(rows) == 5 and rows[0].owner_login == "octo"

    def test_bearer_token_sent(self, spark, gh):
        eng = ss.connect(
            {"sources": [{"name": "gh4", "type": "github", "url": gh,
                          "options": {"repo": "octo/private", "token": "ghp_test"},
                          "tables": [{"name": "issues"}]}]},
            spark=spark,
        )
        assert eng.sql("SELECT count(*) AS n FROM gh4_issues").first().n == 3

    def test_missing_repo_and_unknown_table_fail_loudly(self, spark, gh):
        from strake_spark.errors import SourceError

        with pytest.raises(Exception, match="needs repo"):
            ss.connect(
                {"sources": [{"name": "bad", "type": "github", "url": gh,
                              "tables": [{"name": "issues"}]}]},
                spark=spark,
            )
        with pytest.raises(Exception, match="no table"):
            ss.connect(
                {"sources": [{"name": "bad2", "type": "github", "url": gh,
                              "options": {"repo": "octo/hello"},
                              "tables": [{"name": "workflows"}]}]},
                spark=spark,
            )

    def test_graphql_issues_cursor_pagination(self, spark, gh):
        """The GraphQL half of the connector row: POST /graphql,
        Relay cursor into variables.after, stop on hasNextPage even
        though endCursor stays non-null on the last page."""
        eng = ss.connect(
            {"sources": [{"name": "gq", "type": "github", "url": gh,
                          "options": {"repo": "octo/hello", "token": "ghp_test"},
                          "tables": [{"name": "graphql_issues"}]}]},
            spark=spark,
        )
        rows = eng.sql(
            "SELECT number, author_login, comment_count, reaction_count "
            "FROM gq_graphql_issues ORDER BY number"
        ).collect()
        assert len(rows) == 23  # 3 cursor pages; no infinite loop
        assert rows[5].author_login == "user2"
        assert rows[5].comment_count == 5 and rows[5].reaction_count == 10

    def test_graphql_requires_token(self, spark, gh):
        with pytest.raises(Exception, match="needs a token"):
            ss.connect(
                {"sources": [{"name": "gq2", "type": "github", "url": gh,
                              "options": {"repo": "octo/hello"},
                              "tables": [{"name": "graphql_issues"}]}]},
                spark=spark,
            )

    def test_analytics_join_shape(self, spark, gh):
        """The point of the preset: repo/issue analytics in plain SQL."""
        eng = ss.connect(
            {"sources": [{"name": "gh5", "type": "github", "url": gh,
                          "options": {"repo": "octo/hello"},
                          "tables": [{"name": "issues"}]}]},
            spark=spark,
        )
        out = eng.sql(
            "SELECT user_login, count(*) AS issues, sum(comments) AS comments "
            "FROM gh5_issues GROUP BY user_login ORDER BY user_login"
        ).collect()
        assert [r.user_login for r in out] == ["user0", "user1", "user2", "user3"]
        assert sum(r.issues for r in out) == 25
