#!/bin/bash
# Stall watchdog for the long quality run on the tunneled TPU backend.
#
# The backend occasionally wedges mid-fetch (see CLAUDE.md); the run is
# crash/resume safe (checkpoint-latest + --auto-resume). This loop watches
# the log's mtime and, when it goes stale, kills the trainer BY PID (never
# by pattern) and relaunches it with --auto-resume.
#
# Usage: tools/run_watchdog.sh <logfile> <pidfile> <stale_s> -- <cmd...>
#
# Pick <stale_s> WELL above the longest legitimate quiet phase: the trainer
# writes nothing while saving the ~1 GB checkpoint-latest through the
# tunnel (observed >15 min when the link is congested). A premature kill
# mid-save is survivable — orbax only commits completed checkpoints, so
# --auto-resume falls back to the previous snapshot — but it costs the
# steps since that snapshot. 1800 s is a sane floor for the 64k-step runs.
set -u
LOG="$1"; PIDFILE="$2"; STALE="$3"; shift 3
[ "$1" = "--" ] && shift

while true; do
  sleep 60
  [ -f "$PIDFILE" ] || continue
  PID=$(cat "$PIDFILE")
  if ! kill -0 "$PID" 2>/dev/null; then
    # completed runs print "done in <s>s"; never relaunch those (a blind
    # relaunch would re-restore ~1 GB through the tunnel forever)
    if grep -q "^done in " "$LOG" 2>/dev/null; then
      echo "[watchdog] trainer completed; exiting" >> "$LOG"
      exit 0
    fi
    echo "[watchdog] trainer $PID gone; relaunching" >> "$LOG"
    nohup "$@" >> "$LOG" 2>&1 &
    echo $! > "$PIDFILE"
    sleep 600  # grace for restore + compile
    continue
  fi
  NOW=$(date +%s)
  MT=$(stat -c %Y "$LOG" 2>/dev/null || echo "$NOW")
  if [ $((NOW - MT)) -gt "$STALE" ]; then
    echo "[watchdog] stale $((NOW - MT))s; restarting $PID" >> "$LOG"
    kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null; sleep 10
    nohup "$@" >> "$LOG" 2>&1 &
    echo $! > "$PIDFILE"
    sleep 600  # grace for restore + compile (restore can crawl when the
               # tunnel is congested — do not re-trigger on the quiet phase)
  fi
done
