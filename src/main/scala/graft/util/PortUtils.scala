package graft.util

import java.net.BindException

/** Port binding with retry (reference: util/PortUtils.scala:30-100):
  * try `startPort`, then successive ports, rolling over 65535 → 1024,
  * up to `maxRetries` attempts; non-bind failures propagate immediately. */
object PortUtils {

  /** `startServer` binds to the given port and returns the actual bound
    * port (servers may bind ephemeral when given 0). */
  def startOnPort(startServer: Int => Int, serviceName: String,
      startPort: Int, maxRetries: Int): Int = {
    require(startPort == 0 || (startPort >= 1024 && startPort <= 65535),
      s"startPort $startPort out of range (1024-65535 or 0 for ephemeral)")
    var attempt = 0
    while (true) {
      val port =
        if (startPort == 0) 0
        else {
          val p = startPort + attempt
          1024 + (p - 1024) % (65536 - 1024) // roll over into user range
        }
      try {
        return startServer(port)
      } catch {
        case e: Exception if isBindCollision(e) =>
          attempt += 1
          if (attempt > maxRetries)
            throw new BindException(
              s"$serviceName failed after $maxRetries retries (start port $startPort): ${e.getMessage}")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Walk the cause chain for bind-collision shapes. */
  def isBindCollision(e: Throwable): Boolean = e match {
    case null => false
    case b: BindException =>
      (b.getMessage != null && b.getMessage.contains("Address already in use")) ||
        isBindCollision(b.getCause)
    case other => isBindCollision(other.getCause)
  }
}
