"""Messaging systems for monitoring events.

Reference behavior (core/.../monitoring/MessagingSystem.scala:24-27):
pick Kafka when ``kafka.bootstrap.servers`` is configured, else stdout.
Kafka is a MONITORING sink only — never a data source — matching the
reference (KafkaMessagingSystem.scala:24-46)."""

from __future__ import annotations

import json
import logging
from typing import Any, Protocol

from amadou_spark.monitoring.events import Event

log = logging.getLogger("amadou_spark.monitoring")


class MessagingSystem(Protocol):
    def publish(self, event: Event) -> None: ...
    def publish_stage(self, event: Event) -> None: ...
    def stop(self) -> None: ...


class PrintMessagingSystem:
    """Stdout/log publisher (reference: PrintMessagingSystem.scala:20-23)."""

    def __init__(self, quiet: bool = True):
        self.quiet = quiet

    def publish(self, event: Event) -> None:
        line = json.dumps(event.to_dict(), default=str)
        if self.quiet:
            log.debug("%s %s", event.topic, line)
        else:
            print(f"[{event.topic}] {line}")

    publish_stage = publish

    def stop(self) -> None:
        pass


class RecordingMessagingSystem:
    """Test double: records every event (the reference's StageSpec uses a
    recording TestContext, StageSpec.scala:27-43)."""

    def __init__(self) -> None:
        self.events: list[Event] = []

    def publish(self, event: Event) -> None:
        self.events.append(event)

    publish_stage = publish

    def stop(self) -> None:
        pass

    def states(self, topic: str | None = None) -> list[tuple[str, str]]:
        return [
            (getattr(e, "stage", ""), e.state)
            for e in self.events
            if topic is None or e.topic == topic
        ]


class KafkaMessagingSystem:
    """JSON-to-Kafka publisher, import-gated (kafka-python is optional)."""

    def __init__(self, bootstrap_servers: str, topic_prefix: str = "amadou"):
        try:
            from kafka import KafkaProducer  # type: ignore[import-not-found]
        except ImportError as exc:  # pragma: no cover - not in test image
            raise RuntimeError(
                "kafka-python not installed; use PrintMessagingSystem"
            ) from exc
        self._producer = KafkaProducer(
            bootstrap_servers=bootstrap_servers,
            value_serializer=lambda v: json.dumps(v, default=str).encode(),
        )
        self._prefix = topic_prefix

    def publish(self, event: Event) -> None:  # pragma: no cover
        self._producer.send(f"{self._prefix}.{event.topic}", event.to_dict())

    publish_stage = publish

    def stop(self) -> None:  # pragma: no cover
        self._producer.flush()
        self._producer.close()


def create_messaging(config: dict[str, Any] | None = None) -> MessagingSystem:
    """Kafka if `kafka.bootstrap.servers` configured, else stdout."""
    config = config or {}
    servers = config.get("kafka.bootstrap.servers")
    if servers:
        return KafkaMessagingSystem(servers, config.get("kafka.topic.prefix", "amadou"))
    return PrintMessagingSystem(quiet=bool(config.get("monitoring.quiet", True)))
