package graft.tools
object SeedScan {
  def main(args: Array[String]): Unit = {
    import graft.fuzz.FuzzGen._
    for (seed <- 1 to 400) {
      val c = gen(seed)
      val desc = c.shape match {
        case AggShape(_, _, h, g) => s"agg($g${h.fold("")(_ => ",having")})"
        case WinShape(_, _, _, _, _, fn) => s"win($fn)"
        case FrameShape(_, _, _, _, f, _, sym) => s"frame($f${if (sym) ",sym" else ""})"
        case SetShape(_, _, op, _, _, rn, wa) =>
          s"set($op${if (rn) ",rn" else ""}${if (wa) ",agg" else ""})"
      }
      val in = c.inSub.fold("")(i =>
        s"/in${if (i.neg) "-not" else ""}${if (i.nullR.isDefined) "-null" else ""}")
      val cs = c.shape match {
        case AggShape(_, aggs, _, _) if aggs.exists(_.kind == "csum") => "/case"
        case _ => ""
      }
      val sd = c.shape match {
        case AggShape(_, aggs, _, _) if aggs.exists(_.kind == "sumd") => "/sumd"
        case _ => ""
      }
      val hs = if (c.havingSub.isDefined) "/havsub" else ""
      val he = c.havingExists.fold("") { case (_, _, neg, _) =>
        // only substantive when the SQL actually renders it (needs an
        // int-modulo first key)
        c.shape match {
          case AggShape(keys, _, _, _)
              if keys.headOption.exists(_.mod.isDefined) =>
            if (neg) "/havnex" else "/havex"
          case _ => ""
        }
      }
      val w8 = c.orExists.fold("")(o =>
        if (o.neg) "/ornex" else "/orex") +
        (if (c.aggOverWin) "/aggwin" else "") +
        (c.shape match {
          case s: SetShape if s.op == "INTERSECT ALL" => "/iall"
          case s: SetShape if s.op == "EXCEPT ALL" => "/eall"
          case _ => ""
        })
      val w10 = (if (c.qualifyExt) "/qual" else "") +
        (if (c.winNulls.isDefined) "/wnulls" else "") +
        (if (c.multiWin) "/mwin" else "")
      val w11 = (if (c.lagNulls.isDefined) "/lagnn" else "") +
        (if (c.argExt.isDefined)
           (if (c.argExt.get._3) "/maxby" else "/minby") else "") +
        (if (c.nthVal) "/nth" else "")
      println(s"$seed ${c.joinKind}${if (c.join.isEmpty) "/nojoin" else ""}${if (c.join2.isDefined) "/chain" else ""}${if (c.scalarSub.isDefined) "/scalar" else ""}${if (c.corrSub.isDefined) "/corr" else ""}$in$cs$sd$hs$he${if (c.lateralAgg.isDefined) "/lateral" else ""}$w8$w10$w11 $desc")
    }
  }
}
