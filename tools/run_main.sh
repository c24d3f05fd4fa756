#!/bin/bash
# Run a graft main directly on the compiled classes (no sbt lock/startup).
# Usage: tools/run_main.sh <MainClass> [args...]   (env passes through)
# Classpath: $GRAFT_CP_FILE if set, else the repo-local target/cp.txt
# (regenerate with: sbt -batch "export Runtime/fullClasspath" > target/cp.txt,
# keeping only the classpath line). Fails fast when missing.
CP_FILE="${GRAFT_CP_FILE:-$(dirname "$0")/../target/cp.txt}"
if [ ! -r "$CP_FILE" ]; then
  echo "run_main.sh: classpath file $CP_FILE missing or unreadable" >&2
  exit 1
fi
CP=$(cat "$CP_FILE")
exec java -cp "$CP" -Xmx110g -Xss16m \
  --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  "$@"
