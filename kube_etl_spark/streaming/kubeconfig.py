"""Kubeconfig parsing — the reference's kubeconfig-from-Secret remote
auth, made real on the engine side.

The reference builds its remote-cluster client from a kubeconfig stored
under the `kubeconfig` key of a Secret in the syncer's namespace
(`clientcmd.RESTConfigFromKubeConfig(secret.Data["kubeconfig"])`,
/root/reference/syncer/controllers/krmsyncer_controller.go:534-559 and
:327-375). This module mirrors that resolution chain exactly — Secret
payload → kubeconfig document → the current-context's (server, auth,
TLS, namespace) — using only the PUBLIC kubeconfig v1 format (the
`kind: Config` document every kubectl user has): clusters[].cluster
{server, certificate-authority[-data], insecure-skip-tls-verify},
users[].user {token, username/password, client-certificate[-data],
client-key[-data]}, contexts[].context {cluster, user, namespace},
current-context.

What stays out (the honest seam): exec plugins and auth-providers
(credential helpers that shell out) raise a loud error naming the
unsupported stanza rather than silently ignoring it. Network transport
lives in streaming/kubeapi.py; this module is pure parsing/validation,
so it is fully testable in the sandbox.
"""

from __future__ import annotations

import base64
import binascii
import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class RestConfig:
    """The resolved connection material for one cluster context — the
    engine analog of client-go's rest.Config."""

    server: str
    context: str
    namespace: str = "default"
    token: str | None = None
    username: str | None = None
    password: str | None = None
    client_cert_pem: bytes | None = field(default=None, repr=False)
    client_key_pem: bytes | None = field(default=None, repr=False)
    ca_pem: bytes | None = field(default=None, repr=False)
    insecure_skip_tls_verify: bool = False

    @property
    def auth_header(self) -> str | None:
        """The Authorization header this config implies, if any."""
        if self.token:
            return f"Bearer {self.token}"
        if self.username is not None:
            creds = f"{self.username}:{self.password or ''}".encode()
            return "Basic " + base64.b64encode(creds).decode()
        return None


def _load_document(text: str | bytes) -> dict:
    if isinstance(text, bytes):
        text = text.decode("utf-8")
    try:
        import yaml  # optional; kubeconfigs are YAML in the wild

        doc = yaml.safe_load(text)
    except ImportError:  # pragma: no cover - yaml is present in CI
        doc = json.loads(text)
    if not isinstance(doc, dict):
        raise ValueError("kubeconfig is not a mapping document")
    return doc


def _by_name(entries, kind: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for e in entries or []:
        name = (e or {}).get("name")
        if not name:
            raise ValueError(f"kubeconfig {kind} entry without a name")
        out[name] = (e or {}).get(kind.rstrip("s")) or {}
    return out


def _inline_or_b64(stanza: dict, key: str) -> bytes | None:
    """`<key>-data` (base64, the portable form) wins over `<key>` (a
    file path — unresolvable inside the engine, rejected loudly)."""
    data = stanza.get(f"{key}-data")
    if data is not None:
        try:
            return base64.b64decode(data, validate=True)
        except (binascii.Error, ValueError) as ex:
            raise ValueError(f"kubeconfig {key}-data is not valid base64: {ex}") from ex
    if stanza.get(key):
        raise ValueError(
            f"kubeconfig references {key} by FILE PATH ({stanza[key]!r}); "
            f"only the inline {key}-data form is portable into the engine — "
            f"re-issue the kubeconfig with embedded credentials "
            f"(kubectl config view --flatten)"
        )
    return None


def rest_config_from_kubeconfig(
    text: str | bytes, context: str | None = None
) -> RestConfig:
    """Resolve a kubeconfig document to its (current or named) context's
    RestConfig — the engine mirror of clientcmd.RESTConfigFromKubeConfig
    (krmsyncer_controller.go:351-354). Raises ValueError with a
    reference-style message on every malformed/unsupported form."""
    doc = _load_document(text)
    clusters = _by_name(doc.get("clusters"), "clusters")
    users = _by_name(doc.get("users"), "users")
    contexts = _by_name(doc.get("contexts"), "contexts")

    ctx_name = context or doc.get("current-context")
    if not ctx_name:
        raise ValueError("kubeconfig has no current-context and none was requested")
    if ctx_name not in contexts:
        raise ValueError(f"kubeconfig context {ctx_name!r} not found")
    ctx = contexts[ctx_name]

    cluster_name = ctx.get("cluster")
    if not cluster_name or cluster_name not in clusters:
        raise ValueError(
            f"kubeconfig context {ctx_name!r} references unknown cluster "
            f"{cluster_name!r}"
        )
    cluster = clusters[cluster_name]
    server = cluster.get("server")
    if not server:
        raise ValueError(f"kubeconfig cluster {cluster_name!r} has no server URL")

    user_name = ctx.get("user")
    user = users.get(user_name, {}) if user_name else {}
    if user_name and user_name not in users:
        raise ValueError(
            f"kubeconfig context {ctx_name!r} references unknown user {user_name!r}"
        )
    for unsupported in ("exec", "auth-provider"):
        if user.get(unsupported):
            raise ValueError(
                f"kubeconfig user {user_name!r} uses {unsupported!r} credentials — "
                f"credential-helper auth shells out and is not supported by the "
                f"engine; issue a token or client-certificate kubeconfig instead"
            )

    cert = _inline_or_b64(user, "client-certificate")
    key = _inline_or_b64(user, "client-key")
    if (cert is None) != (key is None):
        raise ValueError(
            "kubeconfig user has client-certificate-data or client-key-data "
            "but not both"
        )

    return RestConfig(
        server=server.rstrip("/"),
        context=ctx_name,
        namespace=ctx.get("namespace") or "default",
        token=user.get("token"),
        username=user.get("username"),
        password=user.get("password"),
        client_cert_pem=cert,
        client_key_pem=key,
        ca_pem=_inline_or_b64(cluster, "certificate-authority"),
        insecure_skip_tls_verify=bool(cluster.get("insecure-skip-tls-verify")),
    )


def rest_config_from_secret(
    secret: dict, secret_name: str = "<unnamed>", context: str | None = None
) -> RestConfig:
    """The reference's Secret → kubeconfig step (krmsyncer_controller.go
    :545-549): the kubeconfig lives under the `kubeconfig` key of
    `data` (base64, the wire form) or `stringData` (plain, the authoring
    form). The missing-key error message mirrors the reference's."""
    data = secret.get("data") or {}
    string_data = secret.get("stringData") or {}
    if "kubeconfig" in string_data:
        payload: str | bytes = string_data["kubeconfig"]
    elif "kubeconfig" in data:
        try:
            payload = base64.b64decode(data["kubeconfig"], validate=True)
        except (binascii.Error, ValueError) as ex:
            raise ValueError(
                f"secret {secret_name} kubeconfig data is not valid base64: {ex}"
            ) from ex
    else:
        raise ValueError(f"secret {secret_name} does not contain 'kubeconfig' key")
    return rest_config_from_kubeconfig(payload, context=context)
