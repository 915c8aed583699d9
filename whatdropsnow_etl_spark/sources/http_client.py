"""HTTP JSON-API client — the runnable twin of the reference's
request layer.

Reference parity:
- wdn_api.py:63-76 ``request`` — GET with a hard request timeout,
  exponential-backoff retry (delay 1 s, x2 per try, capped 60 s,
  10 tries) and opt-in ignore-404 (returns None instead of raising).
- wdn_api.py:108-138 ``paginate_request`` — ``?page=N&page_size=M``
  query params (``&``-joined when the URI already has a query).
- wdn_api.py:94-106 ``iteration_request_multithread`` — per-id
  fan-out; fetches run on a thread pool (the reference uses a
  process pool; threads suffice for I/O-bound GETs), each id's
  payload lands as one JSON-lines file, and Spark's partition
  parallelism over the landed directory distributes the read-back.

The client is ingestion control-flow (driver-side, bounded by the
API's catalog size); landed pages are read back as one distributed
scan via ``normalize_pages``. Auth/custom headers pass through to
every request.
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections.abc import Callable, Iterable, Mapping

from .json_api import PageFetchError, PermanentFetchError, fetch_pages

try:  # pragma: no cover - exercised implicitly by import
    import requests as _requests
except ImportError:  # pragma: no cover
    _requests = None


class HttpJsonClient:
    """Retrying, header-passing JSON GET client.

    ``get_json`` mirrors the reference contract exactly: a transient
    failure (connection error, 5xx, non-OK status) is retried with
    exponential backoff; a 404 with ``ignore_404=True`` returns
    ``None``; retries exhausted raises :class:`PageFetchError`.
    """

    def __init__(
        self,
        base_url: str,
        headers: Mapping[str, str] | None = None,
        timeout: float = 40.0,
        tries: int = 10,
        delay: float = 1.0,
        backoff: float = 2.0,
        max_delay: float = 60.0,
        sleep: Callable[[float], None] = time.sleep,
        session=None,
    ) -> None:
        if session is None and _requests is None:
            raise ImportError(
                "HttpJsonClient needs the 'requests' package (or pass a"
                " compatible session=)"
            )
        self.base_url = base_url.rstrip("/")
        self.headers = dict(headers or {})
        self.timeout = timeout
        self.tries = tries
        self.delay = delay
        self.backoff = backoff
        self.max_delay = max_delay
        self._sleep = sleep
        # requests does not guarantee Session thread-safety (cookie jar
        # and adapter state can race), so self-created sessions are one
        # per thread; an explicitly-passed session is shared as-is and
        # is the caller's concurrency responsibility.
        self._session = session
        self._local = threading.local()

    def _get_session(self):
        if self._session is not None:
            return self._session
        s = getattr(self._local, "session", None)
        if s is None:
            s = _requests.Session()
            self._local.session = s
        return s

    def get_json(self, uri: str, ignore_404: bool = False):
        url = f"{self.base_url}{uri}"
        wait = self.delay
        for attempt in range(self.tries):
            try:
                resp = self._get_session().get(
                    url, headers=self.headers, timeout=self.timeout
                )
                if resp.status_code == 404 and ignore_404:
                    return None
                if not resp.ok:
                    # 4xx (minus 429, the rate-limit signal) is a
                    # PERMANENT client error: retrying a 401/403/404
                    # through the full backoff schedule stalls an
                    # ingestion run minutes per request before
                    # failing anyway — fail fast instead
                    if 400 <= resp.status_code < 500 and resp.status_code != 429:
                        raise PermanentFetchError(
                            f"non-retryable status {resp.status_code}"
                            f" for {url}"
                        )
                    raise PageFetchError(
                        f"request failed with status {resp.status_code} for {url}"
                    )
                return resp.json()
            except PermanentFetchError:
                raise
            except Exception:  # noqa: BLE001 — transient, retry
                if attempt == self.tries - 1:
                    raise
                self._sleep(wait)
                wait = min(wait * self.backoff, self.max_delay)
        raise PageFetchError(f"unreachable: {url}")  # pragma: no cover

    def page_fetcher(self, resource_uri: str) -> Callable[[int, int], Mapping | None]:
        """A ``fetch_page(page, page_size)`` callable for
        :func:`fetch_pages`, building the reference's pagination
        params. Missing pages (404) return None → pagination stops."""

        def fetch_page(page: int, page_size: int):
            sep = "&" if "?" in resource_uri else "?"
            return self.get_json(
                f"{resource_uri}{sep}page={page}&page_size={page_size}",
                ignore_404=True,
            )

        return fetch_page

    def fetch_resource_pages(
        self, resource_uri: str, out_dir: str, page_size: int = 100
    ) -> int:
        """Land every page of ``resource_uri`` as JSON-lines files.
        Retry/backoff happens inside ``get_json`` (the reference puts
        it below pagination too), so ``fetch_pages`` drives with a
        single try per page."""
        return fetch_pages(
            self.page_fetcher(resource_uri), out_dir, page_size, max_tries=1
        )

    def fetch_by_ids(
        self,
        uri_template: str,
        ids: Iterable,
        out_dir: str,
        ignore_404: bool = True,
        max_workers: int = 8,
    ) -> int:
        """Per-id fan-out (reference wdn_api.py:94-106): GET
        ``uri_template.format(id)`` for each id, landing non-empty
        ``data`` payloads one JSON-lines file per id. Returns records
        landed. Reading the directory back gives Spark one split per
        id — the distributed replacement for the process pool.

        Fetches run on a thread pool (``max_workers``), matching the
        reference's concurrent fan-out for slow endpoints; each worker
        thread gets its OWN requests.Session (requests does not
        guarantee Session thread-safety). An explicitly-passed
        ``session=`` is shared across workers as-is — pass a
        thread-safe one or use ``max_workers=1``, which degrades to a
        sequential loop. The first failing id raises after the
        in-flight futures settle."""
        from concurrent.futures import ThreadPoolExecutor

        os.makedirs(out_dir, exist_ok=True)

        def fetch_one(one_id) -> int:
            response = self.get_json(uri_template.format(one_id), ignore_404)
            data = response["data"] if response else []
            if isinstance(data, Mapping):  # single-resource endpoint
                data = [data]
            if not data:
                return 0
            with open(os.path.join(out_dir, f"id-{one_id}.jsonl"), "w") as f:
                for record in data:
                    f.write(json.dumps(record) + "\n")
            return len(data)

        id_list = list(ids)
        if max_workers <= 1:
            return sum(fetch_one(i) for i in id_list)
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            return sum(pool.map(fetch_one, id_list))
