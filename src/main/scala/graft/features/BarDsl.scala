package graft.features

import org.apache.spark.sql.DataFrame
import graft.bars.EventBars

/** Bar-construction configs as serializable values — the bar-side twin of
  * the feature DSL's `save_config`/`from_config` stance (the reference
  * serializes every pipeline component's parameters through its JSON
  * configs, feature/kit.py:959-979, feature/utils.py:132-303; its bar
  * kits expose the same constructor-parameter surface,
  * bar/logic.py:22-221). A [[BarSpec]] is a pure value; [[BarSpec.build]]
  * dispatches to the [[graft.bars.EventBars]] indexer it names, so a JSON
  * pipeline config can reconstruct any event-bar machine — including the
  * round-8 imbalance/run families — without code.
  *
  * JSON is a flat single object per spec ({"bars":"...", numeric/bool
  * params...}); [[BarSpec.fromJson]] inverts [[BarSpec.toJson]] exactly
  * (round-trip gated by `bar_config_roundtrip`). All numeric parameters
  * must be finite — NaN/Infinity render as bare invalid-JSON tokens (the
  * same rule [[FSpec.FCall]] enforces).
  */
sealed trait BarSpec {
  /** Assign bar ids with this spec's machine: input must carry the
    * indexer's required columns (`ts,id,qty[,price][,side]`), output
    * appends `bar_id`/`bar_closed` exactly like the EventBars indexers.
    */
  def build(df: DataFrame, keyCols: Seq[String] = Nil): DataFrame
  def toJson: String
}

object BarSpec {
  private def finite(vs: (String, Double)*): Unit = vs.foreach { case (k, v) =>
    require(!v.isNaN && !v.isInfinite, s"BarSpec parameter $k must be finite, got $v")
  }
  private def jnum(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString else v.toString

  case class TickBars(threshold: Int) extends BarSpec {
    def build(df: DataFrame, keyCols: Seq[String]): DataFrame =
      EventBars.tickBarIds(df, threshold, keyCols)
    def toJson: String = s"""{"bars":"tick","threshold":$threshold}"""
  }

  case class VolumeBars(threshold: Double) extends BarSpec {
    finite("threshold" -> threshold)
    def build(df: DataFrame, keyCols: Seq[String]): DataFrame =
      EventBars.volumeBarIds(df, threshold, keyCols)
    def toJson: String = s"""{"bars":"volume","threshold":${jnum(threshold)}}"""
  }

  case class DollarBars(threshold: Double) extends BarSpec {
    finite("threshold" -> threshold)
    def build(df: DataFrame, keyCols: Seq[String]): DataFrame =
      EventBars.dollarBarIds(df, threshold, keyCols)
    def toJson: String = s"""{"bars":"dollar","threshold":${jnum(threshold)}}"""
  }

  /** TICK imbalance machine (EventBars.imbalanceBarIds). */
  case class TickImbalanceBars(alphaT: Double, alphaB: Double,
                               initT: Double, initB: Double) extends BarSpec {
    finite("alphaT" -> alphaT, "alphaB" -> alphaB, "initT" -> initT, "initB" -> initB)
    def build(df: DataFrame, keyCols: Seq[String]): DataFrame =
      EventBars.imbalanceBarIds(df, alphaT, alphaB, initT, initB, keyCols)
    def toJson: String =
      s"""{"bars":"imbalance","alphaT":${jnum(alphaT)},"alphaB":${jnum(alphaB)},""" +
        s""""initT":${jnum(initT)},"initB":${jnum(initB)}}"""
  }

  /** VOLUME/DOLLAR imbalance machine (EventBars.valueImbalanceBarIds). */
  case class ValueImbalanceBars(dollar: Boolean, alphaT: Double, alphaB: Double,
                                initT: Double, initB: Double) extends BarSpec {
    finite("alphaT" -> alphaT, "alphaB" -> alphaB, "initT" -> initT, "initB" -> initB)
    def build(df: DataFrame, keyCols: Seq[String]): DataFrame =
      EventBars.valueImbalanceBarIds(df, dollar, alphaT, alphaB, initT, initB, keyCols)
    def toJson: String =
      s"""{"bars":"value_imbalance","dollar":$dollar,"alphaT":${jnum(alphaT)},""" +
        s""""alphaB":${jnum(alphaB)},"initT":${jnum(initT)},"initB":${jnum(initB)}}"""
  }

  /** TICK run machine (EventBars.runBarIds). */
  case class TickRunBars(alphaT: Double, alphaP: Double,
                         initT: Double, initP: Double) extends BarSpec {
    finite("alphaT" -> alphaT, "alphaP" -> alphaP, "initT" -> initT, "initP" -> initP)
    def build(df: DataFrame, keyCols: Seq[String]): DataFrame =
      EventBars.runBarIds(df, alphaT, alphaP, initT, initP, keyCols)
    def toJson: String =
      s"""{"bars":"run","alphaT":${jnum(alphaT)},"alphaP":${jnum(alphaP)},""" +
        s""""initT":${jnum(initT)},"initP":${jnum(initP)}}"""
  }

  /** VOLUME/DOLLAR run machine (EventBars.valueRunBarIds). */
  case class ValueRunBars(dollar: Boolean, alphaT: Double, alphaP: Double,
                          alphaV: Double, initT: Double, initP: Double,
                          initV: Double) extends BarSpec {
    finite("alphaT" -> alphaT, "alphaP" -> alphaP, "alphaV" -> alphaV,
      "initT" -> initT, "initP" -> initP, "initV" -> initV)
    def build(df: DataFrame, keyCols: Seq[String]): DataFrame =
      EventBars.valueRunBarIds(df, dollar, alphaT, alphaP, alphaV,
        initT, initP, initV, keyCols)
    def toJson: String =
      s"""{"bars":"value_run","dollar":$dollar,"alphaT":${jnum(alphaT)},""" +
        s""""alphaP":${jnum(alphaP)},"alphaV":${jnum(alphaV)},"initT":${jnum(initT)},""" +
        s""""initP":${jnum(initP)},"initV":${jnum(initV)}}"""
  }

  /** Parse one flat spec object — exact inverse of each spec's toJson. */
  def fromJson(s: String): BarSpec = {
    val fields = parseFlat(s)
    // resolve every field by name so a malformed/truncated config fails
    // with "missing field X in <json>", not a bare NoSuchElementException
    def f(k: String): Any = fields.getOrElse(k,
      throw new IllegalArgumentException(s"missing field $k in $s"))
    def d(k: String): Double = f(k) match {
      case v: Double => v
      case other => throw new IllegalArgumentException(s"field $k: expected number, got $other")
    }
    def b(k: String): Boolean = f(k) match {
      case v: Boolean => v
      case other => throw new IllegalArgumentException(s"field $k: expected bool, got $other")
    }
    f("bars") match {
      case "tick"   => TickBars(d("threshold").toInt)
      case "volume" => VolumeBars(d("threshold"))
      case "dollar" => DollarBars(d("threshold"))
      case "imbalance" =>
        TickImbalanceBars(d("alphaT"), d("alphaB"), d("initT"), d("initB"))
      case "value_imbalance" =>
        ValueImbalanceBars(b("dollar"), d("alphaT"), d("alphaB"), d("initT"), d("initB"))
      case "run" =>
        TickRunBars(d("alphaT"), d("alphaP"), d("initT"), d("initP"))
      case "value_run" =>
        ValueRunBars(b("dollar"), d("alphaT"), d("alphaP"), d("alphaV"),
          d("initT"), d("initP"), d("initV"))
      case other => throw new IllegalArgumentException(s"unknown bar kind $other")
    }
  }

  /** Minimal flat-object parser: {"k":string|number|bool, ...} — the only
    * grammar the codec above emits (no nesting, no arrays, no escapes
    * beyond what kind names need).
    */
  private def parseFlat(s: String): Map[String, Any] = {
    var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      ws(); require(i < s.length && s(i) == c, s"expected '$c' at $i in $s"); i += 1
    }
    def str(): String = {
      expect('"')
      val start = i
      while (i < s.length && s(i) != '"') i += 1
      require(i < s.length, s"unterminated string starting at ${start - 1} in $s")
      val r = s.substring(start, i); i += 1; r
    }
    val out = scala.collection.mutable.LinkedHashMap[String, Any]()
    expect('{')
    var done = false
    while (!done) {
      ws()
      val k = str()
      expect(':')
      ws()
      require(i < s.length, s"truncated input after key $k in $s")
      val v: Any = s(i) match {
        case '"' => str()
        case 't' => require(s.startsWith("true", i), s"bad token at $i in $s"); i += 4; true
        case 'f' => require(s.startsWith("false", i), s"bad token at $i in $s"); i += 5; false
        case _ =>
          val start = i
          while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
          val tok = s.substring(start, i)
          try tok.toDouble catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(s"bad number '$tok' at $start in $s")
          }
      }
      out(k) = v
      ws()
      require(i < s.length, s"truncated input (missing '}') in $s")
      if (s(i) == ',') i += 1 else { expect('}'); done = true }
    }
    out.toMap
  }
}
