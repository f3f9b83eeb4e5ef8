"""MQTT source/destination (kawa x/mqtt parity) as a Spark 4 Python
DataSource + foreachBatch publisher.

Reference: subscribe-side bridges the paho callback into a channel
(/root/reference/x/mqtt/mqtt.go:240-273, Recv :278-285); publish-side
blocks per message (:188-198). Here:

* source — Python DataSource whose stream reader drains a paho
  subscription into microbatches; envelope mapping Key=MessageID,
  Topic=mqtt topic matches the reference.
* destination — ``mqtt_publisher`` returns a foreachBatch flush that
  publishes each row and (QoS≥1) waits for broker acks before
  returning, so the microbatch commits only after the broker accepted
  the batch — the reference's ack-after-publish, wholesale.

Client resolution: paho-mqtt when installed (production path),
otherwise the built-in minimal 3.1.1 client (sources/mqtt_mini.py —
same wire protocol over real TCP, paho-shaped API). Either way the
connector itself is LIVE-tested end-to-end: tests/test_mqtt.py runs
the reference's conformance shape (N random payloads → delivered
exactly once, in envelope form) against an in-process broker.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

try:  # pragma: no cover - not installed here
    import paho.mqtt.client as _paho  # type: ignore

    HAVE_PAHO = True
except ImportError:
    _paho = None
    HAVE_PAHO = False


def _client_factory():
    """paho Client when available, else the built-in minimal client
    (identical surface for the subset this connector uses)."""
    if HAVE_PAHO:
        return _paho.Client()
    from kawa_spark.sources.mqtt_mini import MiniClient

    return MiniClient()


class _MqttStreamReader(SimpleDataSourceStreamReader):
    """Drains a subscription buffer per microbatch. Offsets count
    received messages; MQTT (like kawa's source) cannot replay an
    arbitrary committed range — redelivery relies on QoS≥1 resends,
    so readBetweenOffsets returns empty (documented at-most-replay
    gap, identical to the reference's contract)."""

    def __init__(self, options: dict) -> None:
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", 1883))
        self.topic = options["topic"]
        self.qos = int(options.get("qos", 1))
        self._buf: list[tuple[str, bytes, str]] = []
        self._count = 0
        self._client = None
        # connect eagerly: the subscription must be live before batch 0
        # commits, or messages published "after stream start" are lost
        self._connect()

    def _connect(self) -> None:
        self._client = _client_factory()
        self._client.on_message = self._on_message
        self._client.connect(self.host, self.port)
        self._client.subscribe(self.topic, qos=self.qos)
        self._client.loop_start()

    # Spark pickles the reader while planning the scan (the simple-
    # reader wrapper ships to executors; prefetch itself stays on the
    # driver). A live socket cannot pickle — strip it; the executor
    # copy only replays prefetched rows and never reads the wire.
    def __getstate__(self) -> dict:
        state = self.__dict__.copy()
        state["_client"] = None
        state["_buf"] = []
        return state

    def _on_message(self, _client, _userdata, msg) -> None:
        self._buf.append((str(msg.mid), msg.payload, msg.topic))

    def initialOffset(self) -> dict:
        return {"n": 0}

    def read(self, start: dict):
        drained, self._buf = self._buf, []
        self._count += len(drained)
        return iter(drained), {"n": self._count}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(())


class MqttDataSource(DataSource):
    """spark.readStream.format("kawa_mqtt").option("topic", …)"""

    @classmethod
    def name(cls) -> str:
        return "kawa_mqtt"

    def schema(self) -> str:
        return "key string, value binary, topic string"

    def simpleStreamReader(self, schema) -> _MqttStreamReader:
        return _MqttStreamReader(self.options)


def register_mqtt_source(spark) -> None:
    from kawa_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.dataSource.register(MqttDataSource)


def mqtt_publisher(
    topic: str, host: str = "127.0.0.1", port: int = 1883, qos: int = 1
):
    """foreachBatch flush publishing each row's value (MQTT dest
    parity: ack only after all publishes complete — the microbatch
    commits only after every wait_for_publish returned, i.e. the
    broker PUBACKed the whole batch)."""

    def flush(batch_df, batch_id: int) -> None:
        client = _client_factory()
        client.connect(host, port)
        try:
            infos = [
                client.publish(topic, row["value"], qos=qos)
                for row in batch_df.select("value").toLocalIterator()
            ]
            for info in infos:
                info.wait_for_publish()
        finally:
            client.disconnect()

    return flush
