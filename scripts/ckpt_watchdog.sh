#!/bin/bash
# Resumes the config-4 scale run if it stays SIGSTOPped for two consecutive
# checks (bench.py pauses it around tracked stages and resumes in a finally;
# this covers the bench being SIGKILLed between the two).
PIDFILE=${1:-/root/ckpt_c4/run.pid}
while true; do
  sleep 300
  PID=$(cat "$PIDFILE" 2>/dev/null) || continue
  STATE1=$(awk '{print $3}' /proc/$PID/stat 2>/dev/null) || continue
  [ "$STATE1" = "T" ] || continue
  sleep 300
  STATE2=$(awk '{print $3}' /proc/$PID/stat 2>/dev/null) || continue
  if [ "$STATE2" = "T" ]; then
    kill -CONT "$PID" 2>/dev/null && echo "$(date): resumed stopped run $PID" >> /root/ckpt_c4/watchdog.log
  fi
done
