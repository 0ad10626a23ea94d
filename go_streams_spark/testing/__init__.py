"""In-process test doubles for the network connectors.

None of the broker client libraries (redis, nats-py, pulsar-client,
websockets, aerospike) are installed in the build/test environment, and
no brokers run there. These fakes implement the *exact client API
subset* each connector calls, backed by a JSON file so state is shared
across the Spark driver and executor Python workers (the same role
Kafka's ``MockProducer``/``MockConsumer`` play for JVM connectors).

They are NOT mocks of the connector — the connector code under test is
the real one; only the network client underneath is swapped via the
``clientFactory`` option.
"""

from .fake_redis import FakeRedis, fake_redis_factory  # noqa: F401
from .fake_nats import FakeJetStream, fake_nats_factory  # noqa: F401
from .fake_pulsar import FakePulsarClient, fake_pulsar_factory  # noqa: F401
from .fake_websocket import FakeWebSocketServer, fake_websocket_factory  # noqa: F401
from .fake_aerospike import FakeAerospike, fake_aerospike_factory  # noqa: F401
