package graft.pipelines

/** Client-side completion plumbing — the reference's J2/J3/S2/A2 surface
  * (`multirag.c:18-49`, `:236-266`, `curl_helpers.c:28-67`,
  * `multirag.c:155-162`). Pure functions: transport lives in the caller;
  * none of this is a relational operator (SURVEY §2 rows S1/S2).
  */
object Completion {

  /** J2: the `/completion` request body
    * (`generate_server_query`, `multirag.c:18-49`).
    */
  def requestJson(prompt: String, nPredict: Int, stream: Boolean = true): String =
    s"""{"prompt": ${HttpEmbedder.jsonStr(prompt)}, "n_predict": $nPredict, "stream": ${stream}}"""

  /** J3: extract `$.content` from a (non-streamed) completion response;
    * None on parse failure (the reference returns NULL,
    * `multirag.c:236-266`).
    */
  def extractContent(json: String): Option[String] = {
    val key = "\"content\""
    val at = json.indexOf(key)
    if (at < 0) return None
    var i = json.indexOf(':', at + key.length)
    if (i < 0) return None
    i += 1
    while (i < json.length && json(i).isWhitespace) i += 1
    if (i >= json.length || json(i) != '"') return None
    val sb = new StringBuilder
    i += 1
    while (i < json.length && json(i) != '"') {
      if (json(i) == '\\' && i + 1 < json.length) {
        json(i + 1) match {
          case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
          case 'u' if i + 5 < json.length =>
            sb += Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar
            i += 4
          case c => sb += c
        }
        i += 2
      } else { sb += json(i); i += 1 }
    }
    if (i >= json.length) None else Some(sb.toString)
  }

  /** S2: one streamed SSE-ish chunk → token. The reference skips a fixed
    * 5-byte `"data: "` prefix (`curl_helpers.c:44`, brittle); we skip an
    * explicit `data: ` prefix when present and fall back to raw JSON.
    * Returns None for keep-alives/malformed chunks (the reference's
    * `content == NULL` branch).
    */
  def streamToken(chunk: String): Option[String] = {
    val body =
      if (chunk.startsWith("data: ")) chunk.substring(6)
      else if (chunk.length > 5 && !chunk.startsWith("{")) chunk.substring(5)
      else chunk
    extractContent(body)
  }

  /** A2: append an LLM answer to the running conversation
    * (`add_llm_response_to_conversation`, `multirag.c:155-162`).
    */
  def addLlmResponse(conversation: String, answer: String): String =
    conversation + answer

  /** S2 tee: fold a stream of chunks into the full answer, emitting each
    * decoded token through `onToken` AS IT ARRIVES — the reference's
    * `write_function_callback_stream_llm` (`curl_helpers.c:28-67`): print
    * to stdout at `:54-55`, accumulate into the response buffer at
    * `:56-62`. Keep-alives / malformed chunks contribute nothing (the
    * `content == NULL` branch).
    */
  def accumulateStream(chunks: Iterator[String], onToken: String => Unit): String = {
    val sb = new StringBuilder
    chunks.foreach { c =>
      if (c.nonEmpty) streamToken(c).foreach { t => onToken(t); sb ++= t }
    }
    sb.toString
  }
}
