#!/bin/bash
# State-bigger-than-heap ladder (VERDICT r14 #4): drive
# graft.StateHeapProbe across state sizes on BOTH state-store providers,
# each point in its own bounded-heap JVM so a heap-store OOM is a
# recorded exit code, not a lost sweep. Synthesize the inputs first in a
# big-heap JVM: sbt "runMain graft.StateHeapProbe synth <M>" per size.
#
# Usage: tools/stateheap_ladder.sh [Xmx] [sizes...]
#   defaults: Xmx=3g, sizes="2 5 10 20" (millions of distinct keys)
set -u
cd "$(dirname "$0")/.."
XMX="${1:-3g}"; shift || true
SIZES="${*:-2 5 10 20}"
CP="target/scala-2.13/classes:$(echo /opt/spark/jars/*.jar | tr ' ' ':')"
OPENS="-XX:+IgnoreUnrecognizedVMOptions
--add-opens=java.base/java.lang=ALL-UNNAMED
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED
--add-opens=java.base/java.io=ALL-UNNAMED
--add-opens=java.base/java.net=ALL-UNNAMED
--add-opens=java.base/java.nio=ALL-UNNAMED
--add-opens=java.base/java.util=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED
--add-opens=java.base/sun.security.action=ALL-UNNAMED
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
for keys in $SIZES; do
  for prov in heap rocksdb; do
    echo "[stateheap] --- $prov ${keys}M (Xmx=$XMX) ---"
    timeout 2100 java -Xmx"$XMX" -XX:+ExitOnOutOfMemoryError $OPENS \
      -cp "$CP" graft.StateHeapProbe "$prov" "$keys" 2>/dev/null
    rc=$?
    if [ $rc -ne 0 ]; then
      echo "[stateheap] $prov ${keys}M DIED exit=$rc (3=ExitOnOOM, 124=timeout)"
    fi
  done
done
