# Shared chip-queue runner: .done-marker resume discipline.
# Source from a queue script (after cd'ing to the repo root):
#   . tools/chipqueue_lib.sh   # repo-relative: scripts cd to the repo root
#   run NAME TIMEOUT_S CMD...
# Per CLAUDE.md timing discipline: cp the CALLING script to /tmp and run
# the copy (bash reads by byte offset — never edit a running script),
# and never run CPU-heavy host work concurrently with these jobs.
mkdir -p .chiplog
run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if [ -f ".chiplog/${name}.done" ]; then echo "SKIP ${name}"; return; fi
  echo "=== ${name}: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)"
  if timeout "${tmo}" "$@" > ".chiplog/${name}.log" 2>&1; then
    touch ".chiplog/${name}.done"; echo "OK  ${name}"
  else
    echo "FAIL ${name} rc=$?"
  fi
}
