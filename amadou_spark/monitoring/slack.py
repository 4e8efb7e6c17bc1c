"""Slack webhook notifier (reference: Slack.scala:40-67): JSON POST to
a webhook URL, raise on non-200. The HTTP transport is injectable so
jobs can run (and tests can assert payloads) without network access;
`urllib` is the default transport — no third-party dependency."""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass


class SlackError(RuntimeError):
    pass


def _urllib_post(url: str, payload: bytes) -> int:  # pragma: no cover - network
    from urllib.request import Request, urlopen

    req = Request(url, data=payload, headers={"Content-Type": "application/json"})
    with urlopen(req) as resp:
        return resp.status


@dataclass
class Slack:
    url: str
    channel: str
    user: str = "amadou"
    icon: str = ":gear:"
    transport: Callable[[str, bytes], int] = _urllib_post

    def post(self, message: str) -> None:
        payload = json.dumps(
            {
                "channel": self.channel,
                "username": self.user,
                "icon_emoji": self.icon,
                "text": message,
            }
        ).encode()
        status = self.transport(self.url, payload)
        if status != 200:
            raise SlackError(f"Slack webhook returned {status}")
